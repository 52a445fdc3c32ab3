"""Unit tests for LLM-pipeline operators: behavior the DuckDB oracle
can't check (approximate recall, hash bucketing, stubbed decode)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from appstore_aws_etl_spark.llm.dedup import (
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from appstore_aws_etl_spark.llm.multimodal import (
    attach_media_metadata,
    decode_image,
    documents_as_media,
    extract_features,
    fake_image_features,
)
from appstore_aws_etl_spark.llm.similarity import brute_force_knn, ivf_knn


@pytest.fixture(scope="module")
def planted_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # one-token edit
    far = "completely different words about spark engines and parquet files"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=near),
            Row(doc_id=3, text=far),
            Row(doc_id=4, text=base),  # exact dup of 1
        ]
    )


def test_minhash_finds_planted_near_dups(planted_docs):
    pairs = minhash_near_dup_pairs(
        planted_docs, num_hashes=32, bands=8, jaccard_threshold=0.5
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # near dup
    assert (1, 4) in got  # exact dup
    assert (1, 3) not in got and (2, 3) not in got  # unrelated


def test_minhash_estimate_tracks_true_jaccard(planted_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_near_dup_pairs(
            planted_docs, num_hashes=32, bands=8, jaccard_threshold=0.0
        ).collect()
    }
    assert pairs[(1, 4)] == 1.0  # identical signature
    assert pairs[(1, 2)] > 0.5  # high overlap


def test_minhash_big_clique_survives_bucket_cap(spark):
    """Advisor round 10 (medium): a clique duplicated beyond
    max_bucket_docs lands in the SAME mega-bucket in every band, so the
    old drop-only cap zeroed recall for exactly the most-duplicated
    content. The anchor star must keep the clique connected (every
    member reachable from the min id) while staying O(|bucket|)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    clique = [Row(doc_id=i, text=base) for i in range(1, 31)]  # 30 > cap of 10
    others = [
        Row(doc_id=100, text="completely different words about spark engines"),
        Row(doc_id=101, text="another unrelated document mentioning parquet files"),
    ]
    df = spark.createDataFrame(clique + others)
    pairs = minhash_near_dup_pairs(
        df, num_hashes=32, bands=8, jaccard_threshold=0.5, max_bucket_docs=10
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # star connectivity: every clique member pairs with the anchor (min id)
    for i in range(2, 31):
        assert (1, i) in got, f"clique member {i} disconnected by the bucket cap"
    # the cap still prevents the quadratic enumeration of the mega-bucket
    assert len(got) < 30 * 29 / 2
    assert all(r["est_jaccard"] == 1.0 for r in pairs)
    # unrelated docs stay out
    assert not any(a in (100, 101) or b in (100, 101) for a, b in got)


def test_minhash_mixed_mega_bucket_keeps_exact_cliques(spark):
    """Round 11 scalecheck finding: when a shared shingle base merges
    MANY near-identical cliques into the same hot band buckets, the
    bucket-anchor star alone pairs members with an unrelated min-id
    doc and the verify drops them — exact-dup cliques inside mixed
    mega-buckets lost their pairs. The per-signature-group star must
    connect every exact-dup clique through its own anchor at est = 1,
    in hot and non-hot buckets alike."""
    words = [f"w{i}" for i in range(13)]
    rows = []
    for clique in range(30):
        toks = list(words)
        toks[clique % 13] = f"edit{clique}"  # one-word deviation per clique
        text = " ".join(toks)
        for copy in range(10):
            rows.append(Row(doc_id=clique * 100 + copy, text=text))
    df = spark.createDataFrame(rows)
    pairs = minhash_near_dup_pairs(
        df, num_hashes=32, bands=8, jaccard_threshold=0.95, max_bucket_docs=10
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    for clique in range(30):
        anchor = clique * 100
        for copy in range(1, 10):
            member = clique * 100 + copy
            assert (anchor, member) in got, (
                f"exact copy {member} disconnected from its clique anchor "
                f"{anchor} (mixed mega-bucket recall gap)"
            )
            assert got[(anchor, member)] == 1.0
    # the cap still prevents quadratic enumeration of the mega-buckets:
    # 300 near-identical docs would otherwise emit ~300*299/2 pairs
    assert len(got) < 300 * 299 / 2


def test_simhash_exact_dup_same_fingerprint(planted_docs):
    rows = {r["doc_id"]: r for r in simhash_buckets(planted_docs, bits=32).collect()}
    assert rows[1]["simhash"] == rows[4]["simhash"]
    # near dup shares at least one band with the original
    shared = sum(rows[1][f"band_{b}"] == rows[2][f"band_{b}"] for b in range(4))
    assert shared >= 1
    # unrelated doc gets a different fingerprint
    assert rows[1]["simhash"] != rows[3]["simhash"]


def test_ngram_jaccard_exact_values(planted_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(planted_docs, n=3).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert 0.5 < pairs[(1, 2)] < 1.0


def test_ngram_jaccard_df_cap_bounds_hot_gram_pairs(spark):
    # ten docs share one stop-gram; each also has a unique tail.
    # Uncapped, the stop-gram alone emits C(10,2)=45 intersection pairs;
    # with df_cap below 10 it is dropped and only the two true
    # near-dups (same unique tail) intersect.
    rows = [
        Row(doc_id=i, text=f"aaa bbb ccc unique{i} tail{i} end{i}") for i in range(10)
    ]
    rows.append(Row(doc_id=100, text="aaa bbb ccc unique0 tail0 end0"))  # dup of 0
    df = spark.createDataFrame(rows)
    uncapped = ngram_jaccard_pairs(df, n=3).collect()
    assert len(uncapped) >= 45  # hot gram blows up the pair count
    capped = ngram_jaccard_pairs(df, n=3, df_cap=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {(0, 100)}  # only the true dup survives the cap
    (pair,) = capped
    assert pair["jaccard"] == 1.0  # consistent ratio over the capped universe


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    exact = [r["vec_id"] for r in brute_force_knn(emb, qvec, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_knn(emb, qvec, k=10, n_centroids=8, nprobe=6).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    # fixture vectors are ~random (no cluster structure), so expected
    # recall tracks the probe fraction (6/8); real clustered embeddings
    # do far better at the same probe budget
    assert recall >= 0.5
    assert approx[0] == 0  # the query vector itself always routes home


def test_multimodal_metadata_and_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_media_metadata(documents_as_media(docs))
    m = media.limit(5).collect()
    for r in m:
        assert r["meta"]["n_bytes"] == len(r["payload"])
        assert len(r["meta"]["sha256"]) == 64
    feats = extract_features(media.select("media_id", "payload")).collect()
    assert len(feats) == docs.count()
    by_id = {r["media_id"]: r["feature"] for r in feats}
    # deterministic: recomputing locally gives identical features
    payload = m[0]["payload"]
    assert by_id[m[0]["media_id"]] == pytest.approx(fake_image_features(payload))


def test_embedding_near_dup_finds_planted_duplicate(spark):
    from appstore_aws_etl_spark.llm.dedup import embedding_near_dup_pairs

    base = [0.5, -0.2, 0.1, 0.9, -0.7, 0.3, 0.2, -0.1]
    near = [x * 1.001 for x in base]          # same direction
    far = [-x for x in base]                   # opposite
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=base), Row(vec_id=2, embedding=near),
         Row(vec_id=3, embedding=far)]
    )
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.999
    assert (1, 3) not in pairs


def test_embedding_bucket_cap_reports_and_keeps_clique_connected(spark, caplog):
    """Round 11 (verdict item 4): the hyperplane-LSH output cap. A
    same-direction clique wider than max_bucket_vecs shares every band
    bucket, so the cap must (a) replace the quadratic enumeration with
    a verified anchor star that keeps the clique connected, and (b)
    REPORT the truncation driver-side — never silently."""
    import logging

    from appstore_aws_etl_spark.llm.dedup import embedding_near_dup_pairs

    base = [0.5, -0.2, 0.1, 0.9, -0.7, 0.3, 0.2, -0.1]
    clique = [
        Row(vec_id=i, embedding=[x * (1 + 0.0001 * i) for x in base])
        for i in range(1, 31)  # 30 same-direction vectors > cap of 10
    ]
    others = [Row(vec_id=100, embedding=[-x for x in base])]
    df = spark.createDataFrame(clique + others)
    with caplog.at_level(logging.WARNING, "appstore_aws_etl_spark.llm.similarity"):
        rows = embedding_near_dup_pairs(
            df, threshold=0.95, max_bucket_vecs=10
        ).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    # star connectivity: every clique member pairs with the anchor
    for i in range(2, 31):
        assert (1, i) in got, f"clique member {i} disconnected by the cap"
    # the cap prevents the quadratic enumeration
    assert len(got) < 30 * 29 / 2
    # opposite-direction vector never collides above the threshold
    assert not any(100 in p for p in got)
    # no-silent-cap: the truncation was logged with the bucket count
    assert any("max_bucket_vecs" in r.message for r in caplog.records)


def test_split_assign_deterministic_and_partition_stable(spark, sf_dir):
    from appstore_aws_etl_spark.llm.sampling import split_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id", w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.repartition(7), "doc_id", w).collect()
    }
    assert a == b  # stable under partition layout
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) == {"train", "val", "test"}


def test_pack_documents_invariants(spark):
    from appstore_aws_etl_spark.llm.packing import pack_documents

    rows = [Row(source="s1", doc_id=i, n_tokens=t) for i, t in enumerate([400, 500, 300, 900, 1200, 100])]
    rows += [Row(source="s2", doc_id=100, n_tokens=50)]
    out = pack_documents(spark.createDataFrame(rows), budget=1000).collect()
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r["source"], r["bin_id"]), []).append(r)
    for (src, _bin), members in by_bin.items():
        total = sum(m["n_tokens"] for m in members)
        # a bin only exceeds the budget when it is a single oversized doc
        assert total <= 1000 or len(members) == 1
        # offsets are a proper prefix layout in doc_id order
        members.sort(key=lambda m: m["doc_id"])
        acc = 0
        for m in members:
            assert m["offset"] == acc
            acc += m["n_tokens"]
    # greedy layout for s1: [400+500], [300], [900], [1200], [100]
    s1 = sorted((r for r in out if r["source"] == "s1"), key=lambda r: r["doc_id"])
    assert [r["bin_id"] for r in s1] == [0, 0, 1, 2, 3, 4]


def test_decode_rejects_non_netpbm():
    # formats that need codec libs (PNG/JPEG) are rejected loudly, not
    # half-decoded; netpbm decode itself is covered in
    # tests/test_multimodal_source.py
    with pytest.raises(ValueError, match="unsupported"):
        decode_image(b"\x89PNG...")


def test_chunking_covers_text_and_overlaps(spark):
    from appstore_aws_etl_spark.llm.text import chunk_documents

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 10), Row(doc_id=2, text="b" * 451)]
    )
    rows = chunk_documents(docs, chunk_chars=200, stride=150).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text
    # short doc: one chunk, the whole text
    assert by_doc[1] == {0: "a" * 10}
    # 451 chars at stride 150 -> ceil(451/150) = 4 chunks, contiguous ids
    assert sorted(by_doc[2]) == [0, 1, 2, 3]
    # stride < chunk means adjacent chunks overlap by chunk-stride chars
    assert by_doc[2][0][150:200] == by_doc[2][1][:50]
    # last chunk is the tail remainder
    assert by_doc[2][3] == "b" * (451 - 3 * 150)


def test_frame_sampling_bounds_and_determinism(spark):
    import hashlib

    from appstore_aws_etl_spark.llm.multimodal import documents_as_media, sample_frames

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x" * 100), Row(doc_id=2, text="y" * 2000)]
    )
    rows = sample_frames(documents_as_media(docs)).collect()
    frames = {}
    for r in rows:
        frames.setdefault(r.media_id, []).append(r)
    # short payload: a single (padded-by-truncation) frame
    assert [f.frame_idx for f in frames[1]] == [0]
    assert frames[1][0].n_frame_bytes == 100
    # long payload: capped at max_frames, 25fps timestamps
    assert [f.frame_idx for f in sorted(frames[2], key=lambda f: f.frame_idx)] == [0, 1, 2, 3]
    assert sorted(f.frame_ts_ms for f in frames[2]) == [0, 40, 80, 120]
    # frame hash equals hashing the byte slice directly
    assert frames[2][0].frame_sha256 == hashlib.sha256(b"y" * 256).hexdigest()


def test_stratified_sample_exact_quota(spark):
    from appstore_aws_etl_spark.llm.sampling import stratified_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 10 else "de") for i in range(1, 101)]
    )
    out = stratified_sample(df, ["lang"], "doc_id", 0.2).groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in out.collect()}
    # en has 90 rows -> exactly ceil(18), de has 10 -> exactly 2
    assert counts == {"en": 18, "de": 2}
    # deterministic: a rerun picks the identical rows
    a = sorted(r.doc_id for r in stratified_sample(df, ["lang"], "doc_id", 0.2).collect())
    b = sorted(r.doc_id for r in stratified_sample(df, ["lang"], "doc_id", 0.2).collect())
    assert a == b


def test_knn_rerank_recall_vs_brute_force(spark, sf_dir):
    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.orderBy("vec_id").select("embedding").limit(1).collect()[0][0]
    exact = [r["vec_id"] for r in brute_force_knn(emb, qvec, k=10).collect()]
    approx = [r["vec_id"] for r in REGISTRY["llm_knn_rerank"].fn(spark, sf_dir).collect()]
    # int8 quantization perturbs scores ~1/127 relative; with a 5x
    # candidate pool the exact rerank recovers nearly all of the true
    # top-10 on the fixture
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8
    assert approx[0] == 0  # the query vector itself is its own 1-NN


def test_dedup_survivors_remove_planted_copies(spark, sf_dir):
    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    survivors = {
        r["doc_id"]
        for r in REGISTRY["llm_dedup_survivors"].fn(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = {
        r["doc_id"] + 100000
        for r in docs.filter(F.col("doc_id") % 10 == 0).select("doc_id").collect()
    }
    # every planted copy is an exact dup of its base: identical MinHash
    # signatures guarantee an LSH candidate pair, and min-label keeps
    # the lower id — no planted +100000 copy may survive
    assert not (survivors & planted)
    # dedup never invents documents and never empties the corpus
    base_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert survivors <= base_ids | planted
    assert len(survivors) >= len(base_ids) // 2


def test_semantic_dedup_drops_planted_near_identical(spark):
    """SemDeDup keep-first greedy: vectors pointing the same direction
    as a lower-id vector are dropped; distinct directions all survive.
    Vectors are spread far enough apart that every same-direction pair
    lands in the same k-means cluster regardless of seeding."""
    import numpy as np

    from appstore_aws_etl_spark.llm.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    bases = [rng.standard_normal(8).tolist() for _ in range(4)]
    rows = []
    vid = 0
    expected_survivors = set()
    for b in bases:
        rows.append(Row(vec_id=vid, embedding=[float(x) for x in b], label=0))
        expected_survivors.add(vid)
        vid += 1
        # planted near-identical copy: same direction, scaled — must drop
        rows.append(Row(vec_id=vid, embedding=[float(x * 1.01) for x in b], label=0))
        vid += 1
    df = spark.createDataFrame(rows)
    got = {r["vec_id"] for r in
           semantic_dedup(df, n_centroids=2, iterations=2, threshold=0.99).collect()}
    # every copy dropped, every original kept (cosine(original, copy)=1;
    # random 8-dim directions are far below 0.99 pairwise)
    assert got == expected_survivors


def test_semantic_dedup_chain_keeps_non_duplicates(spark):
    """Greedy chain semantics: a ~ b and b ~ c but a !~ c must keep
    {a, c} — b is dropped against kept a, and c survives because its
    only similar mate (b) was itself dropped. Transitive any-lower-id
    masking would wrongly delete c. Vectors are 2-d unit directions
    at angles 0, 20, 40 degrees with threshold cos(25deg)."""
    import math

    from appstore_aws_etl_spark.llm.similarity import semantic_dedup

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [Row(vec_id=0, embedding=unit(0), label=0),
            Row(vec_id=1, embedding=unit(20), label=0),
            Row(vec_id=2, embedding=unit(40), label=0)]
    df = spark.createDataFrame(rows)
    got = {r["vec_id"] for r in
           semantic_dedup(df, n_centroids=1, iterations=1,
                          threshold=math.cos(math.radians(25))).collect()}
    assert got == {0, 2}


def test_semantic_dedup_empty_input(spark):
    from appstore_aws_etl_spark.llm.similarity import semantic_dedup

    empty = spark.createDataFrame(
        [], schema="vec_id long, embedding array<double>, label int"
    )
    assert semantic_dedup(empty).count() == 0


def test_semantic_dedup_blocked_gram_matches_unblocked(spark):
    """The block-wise Gram computation must be invisible: forcing a
    tiny block size (3) over a 12-vector single cluster gives exactly
    the same survivors as one full matrix, including chains that span
    block boundaries."""
    import math

    from appstore_aws_etl_spark.llm.similarity import semantic_dedup

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # 12 vectors at 15-degree steps with threshold cos(20deg):
    # consecutive pairs are similar, skips are not -> greedy keeps
    # every other vector (ids 0,2,4,...)
    rows = [Row(vec_id=i, embedding=unit(15 * i), label=0) for i in range(12)]
    df = spark.createDataFrame(rows)
    thr = math.cos(math.radians(20))
    full = {r["vec_id"] for r in semantic_dedup(
        df, n_centroids=1, iterations=1, threshold=thr,
        gram_block_rows=1024).collect()}
    blocked = {r["vec_id"] for r in semantic_dedup(
        df, n_centroids=1, iterations=1, threshold=thr,
        gram_block_rows=3).collect()}
    assert full == blocked == {0, 2, 4, 6, 8, 10}


def test_topic_cluster_assignment_is_nearest_centroid(spark, sf_dir):
    """Property twin for the rows-only llm_topic_cluster key: every
    vector must land on its argmax-cosine centroid (checked against a
    numpy re-derivation), and the rollup must cover the whole corpus."""
    import numpy as np

    import appstore_aws_etl_spark.queries  # noqa: F401 — populate REGISTRY
    from appstore_aws_etl_spark.llm.similarity import (
        assign_to_centroids,
        train_centroids,
    )
    from appstore_aws_etl_spark.registry import REGISTRY

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = train_centroids(emb, n_centroids=8, iterations=2)
    cmat = np.array([vec for _, vec in centroids], dtype=np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    cids = np.array([cid for cid, _ in centroids])

    assigned = assign_to_centroids(emb, centroids, "embedding").collect()
    n_checked = 0
    for r in assigned[:200]:
        v = np.array(r["embedding"], dtype=np.float64)
        v /= np.linalg.norm(v)
        expect = cids[int(np.argmax(cmat @ v))]
        assert r["centroid_id"] == expect, r["vec_id"]
        n_checked += 1
    assert n_checked == 200

    rollup = REGISTRY["llm_topic_cluster"].fn(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rollup) == emb.count()
    assert all(-1.0 <= r["avg_cos_to_center"] <= 1.0 for r in rollup)


def test_pq_recall_vs_brute_force(spark, sf_dir):
    """Product-quantization ANN: 32x-compressed ADC candidates + exact
    rerank must recover most of the true top-10, and must be exact for
    the query vector itself (its own codes minimize every block's
    lookup table)."""
    from appstore_aws_etl_spark.llm.similarity import pq_encode, pq_knn, train_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    exact = [r["vec_id"] for r in brute_force_knn(emb, qvec, k=10).collect()]
    books = train_pq(emb, m=8, k_codes=16)
    approx = [
        r["vec_id"]
        for r in pq_knn(emb, qvec, k=10, rerank_factor=5, codebooks=books).collect()
    ]
    # random fixture vectors are PQ's worst case (no block structure);
    # the 5x exact rerank recovers the head of the list regardless
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5
    assert approx[0] == 0  # query vector is its own 1-NN after rerank
    # encode determinism + shape: m small-int codes within [0, k)
    codes = pq_encode(emb, books).select("pq_codes").limit(20).collect()
    for r in codes:
        assert len(r["pq_codes"]) == 8
        assert all(0 <= c < 16 for c in r["pq_codes"])


def test_train_pq_tiny_corpus_rectangular_codebooks(spark):
    """Advisor round 10 (low): a corpus with fewer distinct vectors
    than k_codes used to leave per-block codebooks with UNEQUAL
    lengths, crashing pq_encode's tensor / ivfpq's LUT downstream.
    Blocks must come back rectangular and still encode/probe."""
    from appstore_aws_etl_spark.llm.similarity import pq_encode, train_pq

    rows = [
        Row(vec_id=i, embedding=[float(i % 3)] * 8 + [float(i % 2)] * 8)
        for i in range(6)
    ]
    emb = spark.createDataFrame(rows)
    books = train_pq(emb, m=2, k_codes=16)
    widths = {len(b) for b in books}
    assert len(widths) == 1, f"ragged codebooks: {[len(b) for b in books]}"
    codes = pq_encode(emb, books).select("pq_codes").collect()
    width = widths.pop()
    for r in codes:
        assert len(r["pq_codes"]) == 2
        assert all(0 <= c < width for c in r["pq_codes"])


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    """IVFADC composite index: cell pruning + residual-PQ ADC + exact
    rerank must recover most of the true top-10; the query vector
    itself must rank first (it sits in a probed cell by construction —
    its own cell is the nearest — and rerank is exact)."""
    from appstore_aws_etl_spark.llm.similarity import ivfpq_knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    exact = [r["vec_id"] for r in brute_force_knn(emb, qvec, k=10).collect()]
    approx_rows = ivfpq_knn(
        emb, qvec, k=10, n_cells=16, nprobe=8, m=8, k_codes=16, rerank_factor=5
    ).collect()
    approx = [r["vec_id"] for r in approx_rows]
    # near-random fixture vectors are the worst case for both stages
    # (no cluster structure for the cells, no block structure for PQ);
    # probing half the cells with a 5x rerank still recovers the head
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4
    assert approx[0] == 0  # query vector is its own 1-NN after rerank


def test_ivfpq_planted_exactness_equals_brute_force(spark):
    """Deterministic IVFADC twin of the PQ planted-exactness case: on
    the block-structured fixture, explicit cells + exact residual
    codebooks give zero quantization error, and probing EVERY cell
    makes the candidate set complete — ivfpq_knn must then equal brute
    force id-for-id. Any deviation is a bug in cell routing, residual
    computation, the per-cell ADC tables, or the rerank — not ANN
    noise (the recall test covers the lossy regime)."""
    from appstore_aws_etl_spark.llm.similarity import brute_force_knn, ivfpq_knn

    m, sub, n_codes = 4, 4, 4
    rows = []
    for i in range(64):
        vec = []
        for j in range(m):
            digit = (i // (n_codes ** j)) % n_codes
            vec.extend([1.0 if p == digit else 0.0 for p in range(sub)])
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    # two explicit cells: unit mass on dim 0 vs dim 1 of block 0 (the
    # normalized vectors have norm 2, components 0.5) — every vector
    # routes deterministically by its block-0 digit's dot product
    cells = [(0, [0.5 if p == 0 else 0.0 for p in range(16)]),
             (1, [0.5 if p == 1 else 0.0 for p in range(16)])]
    # exact residual codebooks per cell geometry: residual block values
    # are in {-0.5, 0, 0.5} one-hot combinations; 8 codes per block
    # cover every residual that occurs (one-hot/2 minus cell component)
    residuals = set()
    import itertools
    for i in range(64):
        v = [x * 0.5 for x in rows[i][1]]
        cell = cells[0] if v[0] >= v[1] else cells[1]
        r = [a - b for a, b in zip(v, cell[1])]
        for j in range(m):
            residuals.add(tuple(r[j * sub:(j + 1) * sub]))
    residuals = sorted(residuals)
    assert len(residuals) <= 16
    books = [[list(r) for r in residuals] for _ in range(m)]
    qvec = rows[0][1]
    exact = brute_force_knn(emb, qvec, k=10).collect()
    approx = ivfpq_knn(
        emb, qvec, k=10, n_cells=2, nprobe=2, rerank_factor=7,
        cells=cells, codebooks=books,
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in approx] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_ivfpq_probe_deployed_index(spark, sf_dir, tmp_path):
    """Train-once / probe-many IVFADC (round-10 item): build the
    materialized index (encoded corpus partitionBy(centroid_id) +
    parameter tables), then probe it WITHOUT retraining. Asserts the
    deployed semantics: (a) the query vector ranks first with score 1
    (exact rerank); (b) recall vs brute force meets the inline path's
    floor; (c) the probe's scan of the codes table PARTITION-PRUNES to
    the probed cells — the plan's parquet source must carry a
    centroid_id partition filter, i.e. un-probed inverted lists are
    never read (the 100 TB point of the layout)."""
    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_probe,
    )
    from appstore_aws_etl_spark.plans import formatted_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(emb, idx, n_cells=16, m=8, k_codes=16)
    res = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8, rerank_factor=5)
    rows = res.collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == 1.0
    exact = {r["vec_id"] for r in brute_force_knn(emb, qvec, k=10).collect()}
    assert len(exact & {r["vec_id"] for r in rows}) / 10 >= 0.4
    plan = formatted_plan(res)
    codes_chunks = [
        c for c in plan.split("\n\n") if "Scan parquet" in c and "/codes" in c
    ]
    assert codes_chunks, "codes-table scan missing from the probe plan"
    assert any(
        "PartitionFilters" in c and "centroid_id" in c.split("PartitionFilters", 1)[1].split("]", 1)[0]
        for c in codes_chunks
    ), f"probe scan does not partition-prune on centroid_id:\n{codes_chunks[0]}"


def test_ivfpq_refresh_makes_arrivals_retrievable(spark, sf_dir, tmp_path):
    """Incremental index maintenance (round 11): build the index on a
    base slice, refresh with the held-out arrivals, probe with an
    arrival's own embedding. Asserts the maintenance semantics:
    (a) the UNREFRESHED index cannot return the arrival; (b) after
    refresh the arrival ranks first at score 1 through the delta
    relation (exact rerank); (c) the refresh is idempotent — running
    it twice leaves the same result (overwrite-delta contract); (d)
    the delta scan partition-prunes on centroid_id like the base."""
    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_probe,
        ivfpq_refresh,
    )
    from appstore_aws_etl_spark.plans import formatted_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(base, idx, n_cells=16, m=8, k_codes=16)
    before = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8).collect()
    assert all(r["vec_id"] != 7 for r in before), "unrefreshed index returned an arrival"
    ivfpq_refresh(spark, idx, arrivals)
    after = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8)
    rows = after.collect()
    assert rows[0]["vec_id"] == 7 and rows[0]["score"] == 1.0
    ivfpq_refresh(spark, idx, arrivals)  # idempotent overwrite
    again = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8).collect()
    assert [(r["vec_id"], r["score"]) for r in again] == [
        (r["vec_id"], r["score"]) for r in rows
    ]
    plan = formatted_plan(after)
    delta_chunks = [
        c for c in plan.split("\n\n") if "Scan parquet" in c and "codes_delta" in c
    ]
    assert delta_chunks, "delta scan missing from the refreshed probe plan"
    assert any(
        "PartitionFilters" in c
        and "centroid_id" in c.split("PartitionFilters", 1)[1].split("]", 1)[0]
        for c in delta_chunks
    ), f"delta scan does not partition-prune on centroid_id:\n{delta_chunks[0]}"


def test_pq_planted_exactness_equals_brute_force(spark):
    """Stronger than the recall floor (r8 verdict item 7): on a fixture
    whose vectors are block-structured — every block is one of four
    orthonormal prototypes, so a codebook holding exactly those
    prototypes has ZERO quantization error — ADC distances equal true
    distances and pq_knn must return the brute-force top-k EXACTLY
    (same ids, same order, ties by id). Deterministic: no training, the
    exact codebooks are passed in, so any deviation is a bug in the
    ADC lookup-table scan, candidate selection, or rerank — not noise.
    """
    from appstore_aws_etl_spark.llm.similarity import brute_force_knn, pq_knn

    m, sub, n_codes = 4, 4, 4  # dim 16, 4 blocks, 4 one-hot prototypes
    # vec i's block j is the one-hot e_{digit_j(i base 4)}: 64 distinct
    # vectors; cosine(query=vec 0, vec i) = (#zero digits of i) / 4
    rows = []
    for i in range(64):
        vec = []
        for j in range(m):
            digit = (i // (n_codes ** j)) % n_codes
            vec.extend([1.0 if p == digit else 0.0 for p in range(sub)])
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    # normalized vectors have norm 2 (sqrt of 4 unit blocks), so the
    # exact codebook entries are the one-hot prototypes scaled by 1/2
    books = [
        [[0.5 if p == c else 0.0 for p in range(sub)] for c in range(n_codes)]
        for _ in range(m)
    ]
    qvec = rows[0][1]
    exact = brute_force_knn(emb, qvec, k=10).collect()
    approx = pq_knn(emb, qvec, k=10, rerank_factor=5, codebooks=books).collect()
    assert [(r["vec_id"], r["score"]) for r in approx] == [
        (r["vec_id"], r["score"]) for r in exact
    ]
    # sanity on the plant itself: 1-NN is the query (cos 1.0), then the
    # twelve 3-of-4-block neighbours at cos 0.75, id-ordered
    assert approx[0]["vec_id"] == 0 and approx[0]["score"] == 1.0
    assert [r["score"] for r in approx[1:]] == [0.75] * 9


def test_ivfpq_refresh_accumulates_batches(spark, sf_dir, tmp_path):
    """r11-advice (cumulative delta): refreshing batch B after batch A
    must keep A's rows — the delta merge anti-joins superseded ids and
    unions the rest, so successive arrival batches accumulate instead
    of the last overwrite silently dropping earlier ones. Also asserts
    the same-batch idempotency contract still holds after the merge
    rewrite (re-running batch B changes nothing)."""
    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_probe,
        ivfpq_refresh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    batch_a = emb.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 2 == 0))
    batch_b = emb.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 2 == 1))
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(base, idx, n_cells=16, m=8, k_codes=16)
    ivfpq_refresh(spark, idx, batch_a)
    ivfpq_refresh(spark, idx, batch_b)
    qa = emb.filter(F.col("vec_id") == 14).select("embedding").collect()[0][0]
    qb = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    got_a = ivfpq_probe(spark, idx, emb, qa, k=5, nprobe=8).collect()
    got_b = ivfpq_probe(spark, idx, emb, qb, k=5, nprobe=8).collect()
    assert got_a[0]["vec_id"] == 14 and got_a[0]["score"] == 1.0, (
        "batch-A arrival dropped by the batch-B refresh"
    )
    assert got_b[0]["vec_id"] == 7 and got_b[0]["score"] == 1.0
    ivfpq_refresh(spark, idx, batch_b)  # idempotent re-run of the same batch
    again_a = ivfpq_probe(spark, idx, emb, qa, k=5, nprobe=8).collect()
    assert [(r["vec_id"], r["score"]) for r in again_a] == [
        (r["vec_id"], r["score"]) for r in got_a
    ]


def test_ivfpq_delta_detection_is_not_local_fs(spark, sf_dir, tmp_path, monkeypatch):
    """r11-advice (portability): the probe must fold the refresh delta
    even when the driver's LOCAL filesystem cannot see the index path
    (the deployed s3://... case). Simulated by poisoning os.path.exists
    to always say no — detection goes through spark.read, so the
    arrival must still surface."""
    import os as _os

    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_probe,
        ivfpq_refresh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(base, idx, n_cells=16, m=8, k_codes=16)
    ivfpq_refresh(spark, idx, arrivals)
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    monkeypatch.setattr(_os.path, "exists", lambda _p: False)
    rows = ivfpq_probe(spark, idx, emb, qvec, k=5, nprobe=8).collect()
    assert rows[0]["vec_id"] == 7 and rows[0]["score"] == 1.0, (
        "probe missed the delta when os.path.exists is blind (object-store shape)"
    )


def test_ivfpq_retrain_invalidates_stale_delta(spark, sf_dir, tmp_path):
    """r11-advice (medium): a retrain at the same index_path must not
    union a delta encoded against the OLD centroids/codebooks. Two
    layers are asserted: (a) build_ivfpq_index deletes the delta
    relation; (b) even if a stale delta SURVIVES the delete (object-
    store visibility lag — simulated by copying it back), the probe's
    base_fp stamp validation refuses it, so results equal a fresh
    index's."""
    import shutil

    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_probe,
        ivfpq_refresh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(base, idx, n_cells=16, m=8, k_codes=16)
    ivfpq_refresh(spark, idx, arrivals)
    stale = str(tmp_path / "stale_delta")
    shutil.copytree(f"{idx}/codes_delta", stale)
    # retrain with DIFFERENT quantizer geometry -> new params, new fp
    build_ivfpq_index(base, idx, n_cells=8, m=8, k_codes=16, seed=7)
    import os as _os

    assert not _os.path.exists(f"{idx}/codes_delta"), (
        "retrain left the orphaned delta in place"
    )
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    clean = ivfpq_probe(spark, idx, emb, qvec, k=5, nprobe=8).collect()
    # simulate the delete not being visible: restore the stale delta
    shutil.copytree(stale, f"{idx}/codes_delta")
    guarded = ivfpq_probe(spark, idx, emb, qvec, k=5, nprobe=8).collect()
    assert [(r["vec_id"], r["score"]) for r in guarded] == [
        (r["vec_id"], r["score"]) for r in clean
    ], "probe unioned a delta stamped with pre-retrain parameters"


def test_sorted_neighborhood_finds_planted_near_dups(planted_docs):
    """Blocked sorted-neighborhood (round 12): the linear candidate
    generator must find the planted near- and exact-dup pairs (near-
    identical signatures sort adjacent inside every shared band block)
    and keep unrelated docs out, with estimates matching the LSH
    path's definition (same signatures, same verify)."""
    from appstore_aws_etl_spark.llm.dedup import sorted_neighborhood_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in sorted_neighborhood_pairs(
            planted_docs, num_hashes=32, bands=8, jaccard_threshold=0.5
        ).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5  # near dup
    assert not any(3 in p for p in pairs)  # unrelated doc stays out


def test_sorted_neighborhood_output_is_linear_on_megabucket(spark):
    """The property the operator exists for: a corpus that mega-buckets
    (every doc shares most shingles) must yield O(n x bands x k)
    candidates, never the O(n^2) a bucket self-join would enumerate —
    with NO cap parameter involved. 60 docs in one clique: chained
    pairs stay under n*bands*k while full enumeration would be 1770."""
    from appstore_aws_etl_spark.llm.dedup import sorted_neighborhood_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame([Row(doc_id=i, text=base) for i in range(1, 61)])
    pairs = sorted_neighborhood_pairs(
        df, num_hashes=32, bands=8, jaccard_threshold=0.5, chain_k=3
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # identical docs: every pair in the chain window verifies at 1.0,
    # chains are identical across bands (same order), so the output is
    # exactly the k-successor pairs of one sorted order
    assert len(got) <= 60 * 8 * 3
    assert len(got) < 1770  # strictly below full enumeration
    # connectivity for a components consumer: the chain spans the clique
    ids = set(range(1, 61))
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in got:
        parent[find(a)] = find(b)
    assert len({find(i) for i in ids}) == 1, "chain did not span the clique"


def test_survivors_second_chance_recovers_mixed_bucket_near_dups(spark):
    """Round-12 recovery pass: near-dup (NOT identical) pairs inside a
    >cap mixed mega-bucket are exactly what the cap forfeits (anchor
    stars verify-fail against the unrelated bucket anchor; signature
    stars only cover exact dups). With second_chance=True the
    sig-sorted chain inside the hot bucket must recover them."""
    words = [f"w{i}" for i in range(13)]
    rows = []
    # 40 near-dup PAIRS (member b differs from a by one token) over a
    # shared 13-token base -> one mixed mega-bucket per band, width 80
    for pair in range(40):
        toks = list(words)
        toks[0] = f"pair{pair}"
        a = " ".join(toks)
        toks[1] = "tweaked"
        b = " ".join(toks)
        rows.append(Row(doc_id=2 * pair + 1, text=a))
        rows.append(Row(doc_id=2 * pair + 2, text=b))
    df = spark.createDataFrame(rows)
    from appstore_aws_etl_spark.llm.dedup import minhash_near_dup_pairs

    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(
            df, num_hashes=32, bands=8, shingle_k=5,
            jaccard_threshold=0.5, max_bucket_docs=10,
        ).collect()
    }
    rescued = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(
            df, num_hashes=32, bands=8, shingle_k=5,
            jaccard_threshold=0.5, max_bucket_docs=10, second_chance=True,
        ).collect()
    }
    want = {(2 * p + 1, 2 * p + 2) for p in range(40)}
    assert rescued >= capped
    missing_before = want - capped
    missing_after = want - rescued
    assert missing_before, "fixture failed to trip the cap forfeit"
    # measured curve on this fixture (21 forfeited): (chain_k=3,
    # rotations=4) leaves 11, the shipped (4,8) leaves 8, (10,16)
    # leaves 1 at ~5x the chain volume — the bar pins the shipped knee
    assert len(missing_after) <= len(missing_before) * 0.45, (
        f"second chance recovered too little: {len(missing_before)} -> "
        f"{len(missing_after)} missing"
    )


def test_ivfpq_compact_folds_delta_into_base(spark, sf_dir, tmp_path):
    """Compaction (round 12, the lifecycle's fourth leg): after
    ivfpq_compact the delta is gone, probes scan ONE relation, results
    are identical to the pre-compaction (base + delta) probe, and a
    second compact is a no-op. A stale delta (retrain fingerprint
    mismatch) must be DISCARDED, not folded."""
    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_compact,
        ivfpq_probe,
        ivfpq_refresh,
    )
    from appstore_aws_etl_spark.plans import formatted_plan
    import os as _os

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(base, idx, n_cells=16, m=8, k_codes=16)
    ivfpq_refresh(spark, idx, arrivals)
    before = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8).collect()
    ivfpq_compact(spark, idx)
    assert not _os.path.exists(f"{idx}/codes_delta"), "compact left the delta"
    after_df = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8)
    after = after_df.collect()
    assert [(r["vec_id"], r["score"]) for r in after] == [
        (r["vec_id"], r["score"]) for r in before
    ], "compaction changed probe results"
    assert after[0]["vec_id"] == 7 and after[0]["score"] == 1.0
    plan = formatted_plan(after_df)
    assert "codes_delta" not in plan, "post-compact probe still scans a delta"
    codes_chunks = [
        c for c in plan.split("\n\n") if "Scan parquet" in c and "/codes" in c
    ]
    assert any(
        "PartitionFilters" in c
        and "centroid_id" in c.split("PartitionFilters", 1)[1].split("]", 1)[0]
        for c in codes_chunks
    ), "compacted base lost centroid_id partition pruning"
    ivfpq_compact(spark, idx)  # idempotent: no delta -> no-op
    again = ivfpq_probe(spark, idx, emb, qvec, k=10, nprobe=8).collect()
    assert [(r["vec_id"], r["score"]) for r in again] == [
        (r["vec_id"], r["score"]) for r in after
    ]


def test_bm25_ranks_term_dense_doc_first(spark, tmp_path):
    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    # hand-planted corpus: doc 1 saturates the query terms, doc 2 has a
    # single hit diluted by length, doc 3 has none (must be absent)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark join window hash spark join"),
            Row(doc_id=2, text="spark " + " ".join(["filler"] * 40)),
            Row(doc_id=3, text="no query terms here at all"),
        ]
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    rows = REGISTRY["llm_bm25_score"].fn(spark, str(tmp_path)).collect()
    by_id = {r["doc_id"]: r["bm25"] for r in rows}
    assert set(by_id) == {1, 2}
    assert by_id[1] > by_id[2] > 0
    # output arrives ranked (score desc)
    assert [r["doc_id"] for r in rows] == [1, 2]


def test_bpe_pair_merge_counts_weighted_pairs(spark, tmp_path):
    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    # vocab: 'aa' freq 2, 'ab' freq 1, 'a' freq 1 (no pair)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aa ab aa"), Row(doc_id=2, text="a")]
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    rows = REGISTRY["llm_bpe_pair_merge"].fn(spark, str(tmp_path)).collect()
    got = {r["pair"]: r["n"] for r in rows}
    # 'aa' contributes its one internal pair x freq 2; 'ab' x freq 1
    assert got == {"aa": 2, "ab": 1}
    # ordered by weighted count desc
    assert [r["pair"] for r in rows] == ["aa", "ab"]


def test_bpe_apply_merge_reports_exact_compression(spark, tmp_path):
    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    # winning pair is 'aa' (freq-weighted count 4: 'aaa' has two
    # non-overlap... no — replace is non-overlapping: 'aaa' yields ONE
    # merge; counts below are hand-walked on replace() semantics)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aaa aaa ab"), Row(doc_id=2, text="aa")]
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    [r] = REGISTRY["llm_bpe_apply_merge"].fn(spark, str(tmp_path)).collect()
    # vocab: aaa x2 (pairs aa,aa), ab x1, aa x1 -> 'aa' wins (n=5 > ab 1)
    assert r["merged_pair"] == "aa"
    # merges: aaa -> one non-overlapping 'aa' each (x2), aa -> one (x1)
    assert r["n_merges"] == 3
    # symbols: before = 2*3 + 2 + 2 = 10; each merge removes one symbol
    assert r["symbols_before"] == 10
    assert r["symbols_after"] == 7


def test_bpe_train_matches_sequential_reference(spark, tmp_path):
    import collections

    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    texts = [
        "banana bandana ban",
        "banana banana cabana",
        "abracadabra banana",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    got = [
        (r["step"], r["pair_a"], r["pair_b"], r["merged"], r["n"])
        for r in REGISTRY["llm_bpe_train"].fn(spark, str(tmp_path)).collect()
    ]

    # sequential reference: textbook greedy BPE over the word vocab
    vocab = collections.Counter(
        w for t in texts for w in t.lower().split(" ") if w
    )
    state = {w: list(w) for w in vocab}
    expect = []
    for step in range(1, 7):
        counts = collections.Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        if not counts:
            break
        # max count, ties broken by (a, b) ascending — the query's order
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step, a, b, a + b, n))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    assert got == expect


def test_ivfpq_delete_tombstones_and_compaction(spark, sf_dir, tmp_path):
    """Deletion (round 12, the lifecycle's fifth leg): a deleted id —
    base-resident or delta-resident — never surfaces from a probe;
    re-deleting is idempotent and batches accumulate; compaction
    applies tombstones physically (relation gone, probe results
    unchanged); a retrain clears stale tombstones."""
    import os as _os

    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_compact,
        ivfpq_delete,
        ivfpq_probe,
        ivfpq_refresh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(base, idx, n_cells=16, m=8, k_codes=16)
    ivfpq_refresh(spark, idx, arrivals)
    # base-resident victim: its own embedding is the strongest probe
    qvec1 = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    assert ivfpq_probe(spark, idx, emb, qvec1, k=5, nprobe=8).collect()[0]["vec_id"] == 1
    ivfpq_delete(spark, idx, emb.filter(F.col("vec_id") == 1))
    got = [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec1, k=5, nprobe=8).collect()]
    assert 1 not in got and len(got) == 5
    # delta-resident victim + batch accumulation (second delete keeps the first)
    qvec7 = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    ivfpq_delete(spark, idx, emb.filter(F.col("vec_id") == 7))
    got7 = [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec7, k=5, nprobe=8).collect()]
    got1 = [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec1, k=5, nprobe=8).collect()]
    assert 7 not in got7 and 1 not in got1
    # idempotent re-delete
    ivfpq_delete(spark, idx, emb.filter(F.col("vec_id") == 7))
    assert [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec7, k=5, nprobe=8).collect()] == got7
    # compaction applies tombstones physically and clears them
    before = ivfpq_probe(spark, idx, emb, qvec7, k=10, nprobe=8).collect()
    ivfpq_compact(spark, idx)
    assert not _os.path.exists(f"{idx}/tombstones"), "compact left tombstones"
    after = ivfpq_probe(spark, idx, emb, qvec7, k=10, nprobe=8).collect()
    assert [(r["vec_id"], r["score"]) for r in after] == [
        (r["vec_id"], r["score"]) for r in before
    ], "applying tombstones changed probe results"
    # a retrain clears tombstones: deleted-then-rebuilt ids resurface
    ivfpq_delete(spark, idx, emb.filter(F.col("vec_id") == 1))
    build_ivfpq_index(emb, idx, n_cells=16, m=8, k_codes=16)
    assert not _os.path.exists(f"{idx}/tombstones"), "retrain kept stale tombstones"
    assert ivfpq_probe(spark, idx, emb, qvec1, k=5, nprobe=8).collect()[0]["vec_id"] == 1


def test_ivfpq_delete_survives_interrupted_swap(spark, sf_dir, tmp_path):
    """Round-13 advice hardening: ivfpq_delete's tmp-swap has a window
    (tombstones deleted, tmp not yet renamed in) where a crash leaves
    the accumulated set only in ``tombstones_tmp``. Simulate exactly
    that state and assert (a) probes still honor the deletes via the
    tmp fallback, (b) the next delete RESUMES accumulation from the
    tmp instead of losing history, and (c) the recovery leaves a clean
    main relation with no stray tmp."""
    import shutil
    import os as _os

    from appstore_aws_etl_spark.llm.similarity import (
        build_ivfpq_index,
        ivfpq_delete,
        ivfpq_probe,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivfpq_idx_crash")
    build_ivfpq_index(emb, idx, n_cells=16, m=8, k_codes=16)
    qvec1 = emb.filter(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    ivfpq_delete(spark, idx, emb.filter(F.col("vec_id") == 1))
    # simulate the crash window: main relation gone, committed tmp holds
    # the accumulated set (the exact on-disk state between _fs_replace's
    # delete and rename)
    shutil.move(f"{idx}/tombstones", f"{idx}/tombstones_tmp")
    got = [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec1, k=5, nprobe=8).collect()]
    assert 1 not in got, "probe lost tombstones during the swap window"
    # next delete recovers: completes the swap, then accumulates
    qvec2 = emb.filter(F.col("vec_id") == 2).select("embedding").collect()[0][0]
    ivfpq_delete(spark, idx, emb.filter(F.col("vec_id") == 2))
    got1 = [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec1, k=5, nprobe=8).collect()]
    got2 = [r["vec_id"] for r in ivfpq_probe(spark, idx, emb, qvec2, k=5, nprobe=8).collect()]
    assert 1 not in got1, "recovery lost the pre-crash tombstone"
    assert 2 not in got2, "recovery dropped the new delete"
    assert _os.path.exists(f"{idx}/tombstones")
    assert not _os.path.exists(f"{idx}/tombstones_tmp"), "recovery left a stray tmp"


def test_weighted_sample_prefers_heavy_weights(spark, tmp_path):
    """Statistical sanity for the ES sampler: across many disjoint
    id-offset draws (each a different pseudo-uniform), an item with
    9x the weight is selected into the top-1 far more often than its
    light competitor — the defining property of weighted sampling."""
    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.registry import REGISTRY

    rows = []
    # 200 independent pairs: even id = heavy (w=900), odd id = light
    # (w=100); ids spread out so the LCG draws decorrelate
    for trial in range(200):
        rows.append(Row(doc_id=trial * 1000 + 2, text="h", lang="en",
                        source="s", n_chars=900))
        rows.append(Row(doc_id=trial * 1000 + 3, text="l", lang="en",
                        source="s", n_chars=100))
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    got = REGISTRY["llm_weighted_sample"].fn(spark, str(tmp_path)).collect()
    # the global top-20 of 400 candidates: heavy items (expected
    # selection weight 9:1) must dominate the sample
    heavy = sum(1 for r in got if r["w"] == 900)
    assert len(got) == 20
    assert heavy >= 14, f"heavy-weight items underrepresented: {heavy}/20"


def test_hapax_guard_exact_on_hapax_heavy_corpus(spark):
    """Round-13 vocab-cap guard: on a corpus where most of the
    vocabulary is hapax (unique junk tokens — the adversarial 100 TB
    shape), (a) the df>=2 driver/broadcast relation excludes the hapax
    tail, and (b) tfidf and keywords_topk results are EXACT anyway,
    because a term absent from the map has df exactly 1 (its own
    document is the only contributor). Hapax terms carry the MAXIMUM
    idf, so they must still win top-k — the guard must not drop them
    from the results, only from the map."""
    import math

    from appstore_aws_etl_spark.llm.text import (
        doc_freq_partials,
        keywords_topk,
        tfidf,
    )

    # 40 docs: 3 shared common words + 5 unique junk tokens each ->
    # vocabulary = 3 recurring + 200 hapax
    rows = [
        Row(
            doc_id=i,
            text="the quick fox " + " ".join(f"junk{i}x{j}" for j in range(5)),
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows)
    # the guard engages: df>=2 relation is exactly the 3 recurring terms
    kept = (
        doc_freq_partials(docs)
        .filter(F.col("term").isNotNull() & (F.col("df") >= 2))
        .collect()
    )
    assert sorted(r["term"] for r in kept) == ["fox", "quick", "the"]
    assert all(r["df"] == 40 for r in kept)

    # tfidf: hapax rows surface with df=1 and the max idf, exactly
    got = {(r["doc_id"], r["term"]): (r["df"], r["tfidf"]) for r in tfidf(docs).collect()}
    assert len(got) == 40 * 8
    n = 40
    idf_hapax = math.log((n + 1) / 2) + 1
    idf_common = math.log((n + 1) / (n + 1)) + 1
    assert got[(7, "junk7x3")] == (1, idf_hapax)
    assert got[(7, "quick")] == (40, idf_common)

    # keywords: top-3 per doc must be hapax terms (max idf), ranked by
    # term asc among equal scores
    kw = keywords_topk(docs, k=3).collect()
    by_doc = {}
    for r in kw:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["term"], r["tfidf"]))
    assert len(by_doc) == 40
    for i in range(40):
        picks = sorted(by_doc[i])
        assert [t for _, t, _ in picks] == [f"junk{i}x0", f"junk{i}x1", f"junk{i}x2"]
        assert all(abs(s - round(idf_hapax, 4)) < 1e-9 for _, _, s in picks)


def test_minhash_incremental_finds_planted_corpus_dups(spark):
    """Round-13 steady-state near-dup ingestion: a new batch's docs
    must be matched against the existing corpus — exact dups via the
    signature channel, near-dups via the banded probe — while pairs
    never form between corpus docs (history is not re-paired) or
    between batch docs."""
    from appstore_aws_etl_spark.llm.dedup import minhash_incremental_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words about spark engines and parquet files"
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=far)]
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=101, text=base),   # exact dup of corpus 1
            Row(doc_id=102, text=near),   # near dup of corpus 1
            Row(doc_id=103, text="fresh unseen content nothing matches here"),
        ]
    )
    pairs = {
        (r["batch_id"], r["corpus_id"]): r["est_jaccard"]
        for r in minhash_incremental_pairs(
            corpus, batch, jaccard_threshold=0.5
        ).collect()
    }
    assert pairs[(101, 1)] == 1.0
    assert (102, 1) in pairs and pairs[(102, 1)] > 0.5
    assert not any(b == 103 for b, _ in pairs), "unseen doc matched"
    assert all(b >= 100 and c < 100 for b, c in pairs), "non-probe pair leaked"


def test_minhash_incremental_linear_in_batch_against_hot_corpus(spark):
    """The operator's defining bound: against a corpus that
    mega-buckets (all docs near-identical), candidate/output volume
    stays O(|batch| x bands x cap) — doubling the batch at most
    doubles the output, and a one-doc batch emits at most bands x cap
    + 1 pairs no matter how hot the corpus bucket is."""
    from appstore_aws_etl_spark.llm.dedup import minhash_incremental_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=base) for i in range(1, 81)]
    )  # one 80-wide clique bucket per band
    cap = 5

    def n_pairs(batch_rows):
        batch = spark.createDataFrame(batch_rows)
        return minhash_incremental_pairs(
            corpus, batch, jaccard_threshold=0.5, max_bucket_docs=cap
        ).count()

    one = n_pairs([Row(doc_id=1001, text=base)])
    two = n_pairs([Row(doc_id=1001, text=base), Row(doc_id=1002, text=base)])
    # per batch doc: <= bands*cap banded candidates + 1 exact-channel rep
    assert one <= 8 * cap + 1
    assert two <= 2 * (8 * cap + 1)
    assert two <= 2 * one  # linearity in the batch
    # and the exact channel still guarantees a hit despite the cap
    assert one >= 1 and two >= 2


def test_minhash_index_probe_equals_adhoc_incremental(spark, sf_dir, tmp_path):
    """Round-13 deployed dedup index: probing the persisted index must
    return byte-identical pairs to the ad-hoc minhash_incremental_pairs
    over the same corpus/batch split — the cap discipline and channels
    are the same, only the corpus side's representation differs."""
    from appstore_aws_etl_spark.llm.dedup import (
        build_minhash_index,
        minhash_incremental_pairs,
        minhash_index_probe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(corpus, idx)
    got = sorted(
        (r["batch_id"], r["corpus_id"], r["est_jaccard"])
        for r in minhash_index_probe(
            spark, idx, batch, jaccard_threshold=0.5
        ).collect()
    )
    want = sorted(
        (r["batch_id"], r["corpus_id"], r["est_jaccard"])
        for r in minhash_incremental_pairs(
            corpus, batch, jaccard_threshold=0.5
        ).collect()
    )
    assert got == want and len(got) > 0


def test_minhash_index_refresh_and_compact_lifecycle(spark, tmp_path):
    """Refresh makes newly ingested docs immediately matchable through
    the delta; re-refreshing the same slice is idempotent; compaction
    folds the delta (relations gone) with probe output unchanged."""
    import os as _os

    from appstore_aws_etl_spark.llm.dedup import (
        build_minhash_index,
        minhash_index_compact,
        minhash_index_probe,
        minhash_index_refresh,
    )

    base_text = "the quick brown fox jumps over the lazy dog again and again today"
    new_text = "completely different words about spark engines and parquet files"
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=base_text), Row(doc_id=2, text="unrelated filler words here")]
    )
    idx = str(tmp_path / "mh_idx_r")
    build_minhash_index(corpus, idx)
    ingested = spark.createDataFrame([Row(doc_id=50, text=new_text)])
    batch = spark.createDataFrame(
        [
            Row(doc_id=101, text=base_text),  # dup of original corpus
            Row(doc_id=102, text=new_text),   # dup of the REFRESHED doc
        ]
    )

    def probe():
        return sorted(
            (r["batch_id"], r["corpus_id"], r["est_jaccard"])
            for r in minhash_index_probe(
                spark, idx, batch, jaccard_threshold=0.5
            ).collect()
        )

    # before refresh: only the original-corpus dup matches
    before = probe()
    assert (101, 1, 1.0) in before
    assert not any(b == 102 for b, _, _ in before)
    minhash_index_refresh(spark, idx, ingested)
    after = probe()
    assert (101, 1, 1.0) in after
    assert (102, 50, 1.0) in after, "refreshed doc not matchable through delta"
    # idempotent re-refresh
    minhash_index_refresh(spark, idx, ingested)
    assert probe() == after
    # compact: deltas folded, probe identical
    minhash_index_compact(spark, idx)
    assert not _os.path.exists(f"{idx}/signatures_delta")
    assert not _os.path.exists(f"{idx}/bands_delta")
    assert probe() == after
