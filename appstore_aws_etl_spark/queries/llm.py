"""§2.11 LLM-data-pipeline query inventory (L1-L11 + extensions).

Each operator from llm/ is registered here with a DuckDB oracle where
the semantics are exact, rows-only where they are approximate or
Python-deterministic (MinHash/SimHash bucketing, IVF probing, stubbed
multimodal features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fanout_width, load
from ..ckpt import CHECKPOINT_LEVEL
from ..llm.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from ..llm.multimodal import attach_media_metadata, documents_as_media, extract_features
from ..llm.similarity import (
    brute_force_knn,
    cosine_pairs,
    ivf_knn,
    lsh_similarity_join,
)
from ..llm.text import (
    document_fingerprint,
    keywords_topk,
    language_id,
    ngrams,
    quality_scores,
    tfidf,
    word_counts,
)
from ..registry import query


# --------------------------------------------------------------------------
# L1/L2: dedup family
# --------------------------------------------------------------------------


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 exact dedup on content, deterministic survivor (lowest id).
    digest_keys: the dedup key is the full document, so the shuffle
    carries a 32-byte SHA-256 per row instead of the text and the
    survivor comes from a map-side-combinable min_by (exact_dedup
    docstring has the collision bound)."""
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(
        docs, keys=["text"], order=["doc_id"], digest_keys=True
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "llm_dedup_normalized",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (
                   PARTITION BY trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
                   ORDER BY doc_id
               ) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize-then-dedup — the standard first hygiene pass of a
    training-data pipeline: lowercase, strip non-alphanumerics,
    collapse whitespace, then keep the lowest-id survivor per
    normalized form. Catches the case/punctuation/whitespace variants
    ``llm_dedup_exact`` (byte-identical text) misses; all JVM-side
    regexp_replace, no Python.

    Scale shape (round 10 — the widened 100x tier caught the previous
    plan at 35x the comparator, 23.6 s): two fixes, each measured.
    (1) The window on raw normalized text shipped and SORTED every
    DOCUMENT as its partition key — now the key is a SHA-256 digest
    and the survivor comes from one map-side-combinable min_by
    (32 bytes + 3 small columns per row on the wire, nothing sorts;
    collision bound in exact_dedup's docstring). (2) The digest alone
    changed little because ~19 s was java.util.regex itself walking
    the text at ~10 MB/s — normalization now runs as the Arrow-batched
    bytes.translate UDF (llm/dedup.normalize_ascii_text), memcpy-class
    per byte. Measured at the 100x tier: 23.6 -> 1.3 s (BASELINE.md)."""
    from ..llm.dedup import normalize_ascii_text

    docs = load(spark, sf_dir, "documents")
    norm = normalize_ascii_text(F.col("text"))
    return (
        docs.select(
            F.sha2(norm, 256).alias("__k"),
            F.struct("doc_id", "lang", "source").alias("__row"),
        )
        .groupBy("__k")
        .agg(F.min_by("__row", F.col("__row.doc_id")).alias("__row"))
        .select("__row.*")
    )


@query("llm_dedup_minhash", oracle=None, tags=("llm", "dedup", "approx"))
def llm_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 MinHash-LSH near-dup candidate pairs (approx -> rows-only;
    recall is unit-tested against planted near-duplicates)."""
    docs = load(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(docs, jaccard_threshold=0.5)


@query(
    "llm_dedup_sorted_neighborhood",
    oracle="""
WITH canon AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS c
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id,
           (ascii(substr(c, i::INT, 1))::BIGINT * 67503107
          + ascii(substr(c, i::INT + 1, 1)) * 16974593
          + ascii(substr(c, i::INT + 2, 1)) * 66049
          + ascii(substr(c, i::INT + 3, 1)) * 257
          + ascii(substr(c, i::INT + 4, 1))) % 2147483647 AS h
    FROM canon, LATERAL unnest(range(1, greatest(length(c) - 3, 2))) t(i)
),
perm AS (
    SELECT i AS pi,
           2 * ((874321::BIGINT * (i + 1)) % 2147483647) + 1 AS a,
           (874321::BIGINT * 7919 * (i + 1)) % 2147483647 AS b
    FROM range(32) t(i)
),
sigv AS (
    SELECT doc_id, pi, min((a * h + b) % 2147483647) AS v
    FROM sh CROSS JOIN perm
    GROUP BY doc_id, pi
),
sig AS (
    SELECT doc_id, list(v ORDER BY pi) AS s
    FROM sigv GROUP BY doc_id
),
banded AS (
    SELECT doc_id, s, band,
           s[band::INT * 4 + 1 : band::INT * 4 + 4] AS blk
    FROM sig CROSS JOIN range(8) bb(band)
),
chains AS (
    SELECT doc_id,
           lead(doc_id, 1) OVER w AS n1,
           lead(doc_id, 2) OVER w AS n2,
           lead(doc_id, 3) OVER w AS n3
    FROM banded CROSS JOIN (SELECT unnest([0, 8, 16, 24]) AS r) rot
    WINDOW w AS (PARTITION BY band, blk, r
                 ORDER BY s[r + 1 : 32] || s[1 : r], doc_id)
),
cand AS (
    SELECT DISTINCT least(doc_id, n) AS id_a, greatest(doc_id, n) AS id_b
    FROM (SELECT doc_id, unnest([n1, n2, n3]) AS n FROM chains)
    WHERE n IS NOT NULL
)
SELECT c.id_a, c.id_b,
       round(list_sum(list_transform(range(1, 33),
             i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END)) / 32.0, 4)
           + 0 AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE list_sum(list_transform(range(1, 33),
      i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END)) / 32.0 >= 0.5
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked sorted-neighborhood near-dup pairs (round 12): the
    fully LINEAR candidate generator — band blocks sorted by full
    MinHash signature, each member chained to its next k successors,
    estimate-verified. No bucket self-join exists in the plan, so
    candidate volume is O(n x bands x k) at ANY corpus shape — the
    method to run first at 100 TB, with capped LSH enumeration
    (llm_dedup_minhash) reserved for blocks a recall audit flags.

    Hash-checked since round 13 (verdict item 2): unlike LSH
    bucketing, SNM output is fully deterministic given the pinned
    permutation family — every step is integer math (byte-polynomial
    shingle hash mod 2^31-1, affine permutations, band slices as block
    keys, lexicographic rotation sort, lead() chains), so the oracle
    replays it exactly in ANSI SQL; the round-13 switch of block keys
    from murmur3(slice) to the slice itself removed the one
    engine-specific value in the plan. The estimate divides by 32, a
    power of two, so est_jaccard is binary-exact on both engines.
    Planted recall stays unit-tested."""
    from ..llm.dedup import sorted_neighborhood_pairs

    docs = load(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(docs, jaccard_threshold=0.5)


@query("llm_dedup_simhash", oracle=None, tags=("llm", "dedup", "approx"))
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + band keys (engine-specific hash values ->
    rows-only; banding behavior unit-tested)."""
    docs = load(spark, sf_dir, "documents")
    return simhash_buckets(docs, bits=32, bands=4)


@query("llm_dedup_embedding", oracle=None, tags=("llm", "dedup", "approx"))
def llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (banded random-hyperplane LSH
    prefilter + exact verify; fixture vectors are near-random so the
    threshold sits at the upper tail — planted-duplicate recall
    unit-tested).

    Output-cap contract (round 11, verdict item 4): threshold 0.30 in
    d=64 is OUTPUT-bound by geometry (~1e-2 of ALL pairs are true
    positives), so an uncapped run quadratic-bombs on any large corpus.
    ``max_bucket_vecs=2048`` keeps every bucket's emission linear past
    that width via a verified anchor star, with the truncation logged
    driver-side (never silent — see lsh_candidate_pairs). At sf0.1
    (5k vectors, ~78 per bucket) the cap never engages, so small-tier
    output is byte-identical to the uncapped operator."""
    from ..llm.dedup import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.30, max_bucket_vecs=2048)


@query("llm_dedup_semantic", oracle=None, tags=("llm", "dedup", "similarity", "approx"))
def llm_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (llm/similarity.py semantic_dedup):
    seeded k-means clusters the embedding space, cosine comparisons run
    only WITHIN a cluster (guarded quadratic scope), and any vector at
    >= threshold to a lower-id cluster-mate is dropped — the
    keep-first greedy of arXiv:2303.09540. Rows-only: survivor identity
    depends on the seeded centroid initialization, not an
    ANSI-expressible fixpoint; planted-duplicate recall is
    unit-tested (tests/test_llm.py). Fixture vectors are near-random,
    so the threshold sits at the upper tail and most rows survive."""
    from ..llm.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    return (
        semantic_dedup(emb, iterations=2, threshold=0.95)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


@query(
    "llm_jaccard_ngram",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, source, string_split(lower(text), ' ') AS tk
        FROM documents
    ), grams_all AS (
        SELECT DISTINCT doc_id, lang, source,
               unnest(list_transform(range(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
        FROM toks
    ), grams AS (
        SELECT * FROM (
            SELECT g.*, count(*) OVER (PARTITION BY lang, source, gram) AS df
            FROM grams_all g
        ) WHERE df <= 100
    ), sizes AS (
        SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM grams a JOIN grams b
          ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
           round(n_inter / (sa.n_grams + sb.n_grams - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    """,
    tags=("llm", "dedup"),
)
def llm_jaccard_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-3-gram Jaccard within (lang, source) scope — the
    verify pass behind approximate dedup. The intersection comes from a
    shuffle on the n-gram key, never a cross join; grams with document
    frequency > 100 are dropped on both engines before the self-join
    (hot-gram skew guard — a no-op on this fixture, max df 7, but the
    bound that keeps one stop-gram from emitting k^2 rows at 100 TB)."""
    docs = load(spark, sf_dir, "documents")
    # gram self-join width from the corpus bytes (r14; see
    # ngram_jaccard_pairs docstring). expansion=288 sizes the width for
    # the PAIR-AGGREGATE memory bound, not the byte volume: per-gram
    # fanout is bounded by df_cap^2/2 join rows whose per-partition
    # multiplicity is ~1, so the partial aggregate holds ~every row it
    # sees — at the 100x tier (~0.7B pair rows) width 64 left ~11M-row
    # hash maps per task and OOM'd under 32 concurrent tasks
    # (BENCH100X_PRE_r14: llm_containment_pairs FAILED; reproduced in
    # AB_NGRAMW100X_r14 on the old arm). ~1k partitions bound the map
    # at ~35 MB/task at that tier and measured wall-neutral-to-faster
    # (92.7/69.6 s vs 75.6/89.5 s old — GC-bound variance band).
    w = fanout_width(spark, sf_dir, "documents", expansion=288)
    return ngram_jaccard_pairs(
        docs, n=3, scope_cols=["lang", "source"], df_cap=100, fanout_partitions=w
    )


# --------------------------------------------------------------------------
# L3-L5: similarity
# --------------------------------------------------------------------------


@query(
    "llm_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) + 0
               AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    """,
    tags=("llm", "similarity"),
)
def llm_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 pairwise cosine within label scope, double-precision math on
    both sides (storage is float32).

    All-pairs-per-scope is this operator's contract, so scope size is
    the complexity bound: a plan-embedded guard fails fast if any label
    exceeds 100k vectors (quadratic melt) instead of running it; the
    thresholded scale path is llm_sim_join's LSH prefilter."""
    emb = load(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, scope_col="label", max_scope_rows=100_000)


@query(
    "llm_knn",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) + 0
               AS score
    FROM embeddings e, q
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity"),
)
def llm_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 exact top-k neighbours of the vec_id=0 vector (brute force:
    one scan + TakeOrderedAndProject)."""
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return brute_force_knn(emb, qvec, k=10)


@query("llm_knn_ivf", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 scale path: IVF-routed approximate kNN (recall vs brute force
    unit-tested; approx -> rows-only)."""
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_knn(emb, qvec, k=10, n_centroids=8, nprobe=3)


@query("llm_knn_pq", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 compressed-domain path: product-quantization ANN (Jegou et
    al. 2011) — vectors compressed 32x to 8 codebook codes, asymmetric-
    distance top-50 scored entirely JVM-side from an m x k lookup-table
    literal over the code column, exact cosine rerank of those 50 only.
    The memory-bandwidth story IS the operator: a 100 TB embedding
    corpus becomes ~3 TB of codes, and the ADC scan reads nothing else.
    Approx -> rows-only; recall vs brute force unit-tested
    (tests/test_llm.py::test_pq_recall_vs_brute_force)."""
    from ..llm.similarity import pq_knn

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return pq_knn(emb, qvec, k=10, rerank_factor=5, m=8, k_codes=16)


@query("llm_knn_ivfpq", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 composite index: IVFADC (Jegou et al. 2011 §IV) — the coarse
    quantizer routes the scan to nprobe of n_cells inverted cells
    (partition pruning in a deployed layout), PQ codes compress the
    cell RESIDUALS 32x, per-cell ADC lookup tables score JVM-side, and
    exact cosine reranks the bounded candidate set. This is the shape
    a 100 TB ANN service actually deploys: cells bound the fraction of
    the corpus touched, residual PQ bounds the bytes per touched row.
    Approx -> rows-only; recall + query-self-exactness unit-tested
    (tests/test_llm.py::test_ivfpq_recall_vs_brute_force)."""
    from ..llm.similarity import ivfpq_knn

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivfpq_knn(
        emb, qvec, k=10, n_cells=16, nprobe=8, m=8, k_codes=16, rerank_factor=5
    )


@query("llm_knn_ivfpq_probe", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deployed-index IVFADC: train-once / probe-many (round-10 item —
    ``llm_knn_ivfpq`` trains both quantizers inline per query, which is
    the ad-hoc shape; a served ANN index amortizes training across
    queries, and the bench should see what a probe costs, not what
    training costs). ``build_ivfpq_index`` materializes the encoded
    corpus partitioned BY CELL (``partitionBy(centroid_id)``) plus the
    two parameter tables; this key builds it once per (sf_dir, params)
    into the scan cache and every subsequent run executes ONLY the
    probe: parameter-table load, nprobe cell selection, a parquet scan
    that PARTITION-PRUNES to those cells, the nprobe-bounded ADC LUT
    CASE, TakeOrdered candidates, exact rerank of rerank_factor*k rows.
    Approx -> rows-only; probe-vs-inline agreement + partition pruning
    are unit-tested (tests/test_llm.py)."""
    import os

    from ..llm.similarity import build_ivfpq_index, ivfpq_probe
    from .scans import CACHE_DIR

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    params = "c16_m8_k16_s42"
    # cache key: full-path hash (basenames collide across fixture
    # trees) + params; mtime of the source parquet invalidates the
    # index when a fixture is rebuilt in place
    import hashlib

    src = os.path.join(sf_dir, "embeddings.parquet")
    stamp = str(os.path.getmtime(src)) if os.path.exists(src) else "0"
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{params}|{stamp}".encode()).hexdigest()[:16]
    index_path = os.path.join(CACHE_DIR, "ivfpq_index", key)
    if not os.path.exists(os.path.join(index_path, "codes", "_SUCCESS")):
        build_ivfpq_index(
            emb, index_path, n_cells=16, m=8, k_codes=16, coarse_iterations=2
        )
    return ivfpq_probe(
        spark, index_path, emb, qvec, k=10, nprobe=8, rerank_factor=5
    )


@query("llm_knn_ivfpq_refresh", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_ivfpq_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deployed-index MAINTENANCE: incremental refresh (round 11 — the
    third leg of the served-ANN lifecycle after build-once and
    probe-many). A live corpus grows between retrains; the steady-state
    path assigns ARRIVALS to the existing coarse cells, PQ-encodes
    their residuals with the existing codebooks, and folds them into
    the partitioned index as a delta relation — touching only the
    arrivals, never the corpus (``ivfpq_refresh``). This key builds
    the base index on the vec_id % 7 != 0 slice (cached per fixture
    like the probe key), refreshes with the % 7 == 0 arrivals
    (idempotent delta overwrite, so every bench run converges to the
    same index state), then probes with an ARRIVAL's own embedding —
    the probe partition-prunes base + delta to the same nprobe cells,
    and the arrival must surface through the delta (self-recall
    unit-tested: an unrefreshed index cannot return it). Approx ->
    rows-only."""
    import hashlib
    import os

    from ..llm.similarity import build_ivfpq_index, ivfpq_probe, ivfpq_refresh
    from .scans import CACHE_DIR

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    # vec_id 0 is an arrival (0 % 7 == 0): probing its embedding tests
    # that the refresh actually made it retrievable
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    params = "refresh_c16_m8_k16_s42"
    src = os.path.join(sf_dir, "embeddings.parquet")
    stamp = str(os.path.getmtime(src)) if os.path.exists(src) else "0"
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{params}|{stamp}".encode()).hexdigest()[:16]
    index_path = os.path.join(CACHE_DIR, "ivfpq_index", key)
    if not os.path.exists(os.path.join(index_path, "codes", "_SUCCESS")):
        build_ivfpq_index(
            base, index_path, n_cells=16, m=8, k_codes=16, coarse_iterations=2
        )
    ivfpq_refresh(spark, index_path, arrivals)
    return ivfpq_probe(
        spark, index_path, emb, qvec, k=10, nprobe=8, rerank_factor=5
    )


@query("llm_knn_ivfpq_compact", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_ivfpq_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deployed-index MAINTENANCE: delta compaction (round 12 — the
    fourth and final leg of the served-ANN lifecycle: build-once,
    probe-many, refresh arrivals, COMPACT the delta back into the
    base on schedule). ``ivfpq_compact`` validates the delta against
    the current quantizer fingerprint, supersedes base rows re-encoded
    by arrivals, rewrites the base partitionBy(centroid_id) via a
    tmp-relation swap, and deletes the delta — after which every probe
    scans one relation again. This key builds its OWN index copy (the
    refresh key's cached index must keep its delta), refreshes, then
    compacts, then probes with an arrival's embedding: the arrival
    must surface from the BASE relation with no delta present
    (identity with the pre-compaction probe is unit-tested). Approx ->
    rows-only."""
    import hashlib
    import os

    from ..llm.similarity import (
        build_ivfpq_index,
        ivfpq_compact,
        ivfpq_probe,
        ivfpq_refresh,
    )
    from .scans import CACHE_DIR

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 7 != 0)
    arrivals = emb.filter(F.col("vec_id") % 7 == 0)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    params = "compact_c16_m8_k16_s42"
    src = os.path.join(sf_dir, "embeddings.parquet")
    stamp = str(os.path.getmtime(src)) if os.path.exists(src) else "0"
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{params}|{stamp}".encode()).hexdigest()[:16]
    index_path = os.path.join(CACHE_DIR, "ivfpq_index", key)
    # the compacted end-state is idempotent, so the cache-hit path
    # (compact of a delta-less index: no-op) converges like the others
    if not os.path.exists(os.path.join(index_path, "codes", "_SUCCESS")):
        build_ivfpq_index(
            base, index_path, n_cells=16, m=8, k_codes=16, coarse_iterations=2
        )
        ivfpq_refresh(spark, index_path, arrivals)
    ivfpq_compact(spark, index_path)
    return ivfpq_probe(
        spark, index_path, emb, qvec, k=10, nprobe=8, rerank_factor=5
    )


@query("llm_knn_ivfpq_delete", oracle=None, tags=("llm", "similarity", "approx"))
def llm_knn_ivfpq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deployed-index MAINTENANCE: deletion (round 12 — the fifth leg
    of the served-ANN lifecycle: build, probe, refresh, compact,
    DELETE). A served training-data index must honor removal requests
    (right-to-be-forgotten, licensing takedowns) without rewriting the
    encoded corpus: ``ivfpq_delete`` lands the ids as an accumulating
    tombstone relation, every probe anti-joins it after partition
    pruning (a deleted vector can never surface from base OR delta),
    and the next ``ivfpq_compact`` applies the tombstones physically
    and clears them. This key builds its own index copy, deletes the
    query vector's own id plus two neighbors, then probes with that
    vector's embedding — the exact match and the deleted neighbors
    must be absent while the remaining top-k still returns (probed
    semantics unit-tested, including post-compaction identity and
    delete idempotence). Approx -> rows-only."""
    import hashlib
    import os

    from ..llm.similarity import build_ivfpq_index, ivfpq_delete, ivfpq_probe
    from .scans import CACHE_DIR

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    params = "delete_c16_m8_k16_s42"
    src = os.path.join(sf_dir, "embeddings.parquet")
    stamp = str(os.path.getmtime(src)) if os.path.exists(src) else "0"
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{params}|{stamp}".encode()).hexdigest()[:16]
    index_path = os.path.join(CACHE_DIR, "ivfpq_index", key)
    if not os.path.exists(os.path.join(index_path, "codes", "_SUCCESS")):
        build_ivfpq_index(
            emb, index_path, n_cells=16, m=8, k_codes=16, coarse_iterations=2
        )
    # deleting the same ids every run keeps the cached index convergent
    ivfpq_delete(spark, index_path, emb.filter(F.col("vec_id").isin(0, 7, 14)))
    # returned AS-IS: the tombstone anti-join inside the probe is what
    # excludes the deleted ids — filtering here would mask a bug
    return ivfpq_probe(
        spark, index_path, emb, qvec, k=10, nprobe=8, rerank_factor=5
    )


@query(
    "llm_sim_join",
    oracle="""
    WITH aug AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS vec_id,
               list_transform(embedding, x -> CAST(x * 0.5 AS FLOAT)) AS embedding
        FROM embeddings WHERE vec_id % 5 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) + 0
               AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) + 0
          >= 0.95
    """,
    tags=("llm", "similarity"),
)
def llm_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 threshold similarity join — LSH prefilter + exact verify.

    The fixture embeddings are near-random (max within-label cosine
    ~0.51 at sf<=0.1), so the query plants deterministic near-duplicates
    first: every fifth vector re-enters scaled by 0.5 (same direction,
    cosine exactly 1.0) under vec_id + max(vec_id)+1 (a parameter-only
    scalar collect, collision-proof at any scale factor) — the
    planted-duplicate evaluation standard from the dedup literature.
    The Spark plan is
    the deployment shape: banded random-hyperplane signatures -> band
    bucket join -> exact double cosine >= 0.95; never a scope-wide
    self-join. Scaled copies share every LSH band (sign(v.h) is scale
    invariant), so recall on the planted pairs is exactly 1 and the
    exact-verify stage makes precision 1 — the all-pairs DuckDB oracle
    must therefore match hash-for-hash."""
    emb = load(spark, sf_dir, "embeddings")
    offset = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + F.lit(offset)).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(0.5)).cast("float")).alias(
            "embedding"
        ),
    )
    aug = emb.select("vec_id", "embedding").unionByName(copies)
    # corpus-adaptive signature width (n_planes=None): round 9 found the
    # fixed 32-plane/4-band signature blowing up at a 200k-vector tier
    # (8-bit bands -> ~780-row buckets -> ~6e8 candidate pairs, 70+ GB
    # of sort spill); adaptive sizing pins expected bucket size ~1/4 row
    # at any corpus, and the planted exact-direction pairs still share
    # every band, so the oracle hash-match is unaffected.
    return lsh_similarity_join(aug, threshold=0.95, n_planes=None, bands=4)


# --------------------------------------------------------------------------
# L6-L9, L11: text analysis
# --------------------------------------------------------------------------


@query(
    "llm_wordcount",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
    GROUP BY token
    """,
    tags=("llm", "text"),
)
def llm_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 corpus token frequencies."""
    return word_counts(load(spark, sf_dir, "documents"))


@query(
    "llm_tfidf",
    oracle="""
    WITH terms AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), df_ AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.term, tf.tf, df_.df,
           round(tf.tf * (ln((n.n_docs + 1) / (df_.df + 1)) + 1), 4) AS tfidf
    FROM tf JOIN df_ USING (term), n
    WHERE tf.doc_id < 30
    """,
    tags=("llm", "text"),
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 smoothed TF-IDF (formula pinned on both sides); document
    frequencies computed over the full corpus, output sliced."""
    docs = load(spark, sf_dir, "documents")
    return (
        tfidf(docs)
        .filter(F.col("doc_id") < 30)
        .withColumn("tfidf", F.round("tfidf", 4))
    )


@query(
    "llm_ngrams",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split(lower(text), ' '))                  AS token,
               generate_subscripts(string_split(lower(text), ' '), 1)  AS p
        FROM documents WHERE doc_id % 25 = 7
    )
    SELECT doc_id, p - 1 AS pos,
           token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY p) AS ngram
    FROM tok
    QUALIFY lead(token) OVER (PARTITION BY doc_id ORDER BY p) IS NOT NULL
    """,
    tags=("llm", "text"),
)
def llm_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8 token bigrams with positions."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 7)
    return ngrams(docs, n=2)


@query(
    "llm_corpus_stats",
    oracle="""
    SELECT lang, source,
           count(*)                                           AS n_docs,
           CAST(sum(n_chars) AS BIGINT)                       AS total_chars,
           round(avg(len(string_split(text, ' '))), 4)        AS avg_tokens,
           min(doc_id)                                        AS first_doc
    FROM documents GROUP BY lang, source
    """,
    tags=("llm", "text"),
)
def llm_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9 per-(lang, source) corpus slice statistics."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


_STOPWORDS_SQL = "['the', 'and', 'of', 'a', 'to', 'in']"


@query(
    "llm_quality_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               length(text)                                   AS n_chars_m,
               len(string_split(lower(text), ' '))            AS n_tokens,
               round(length(regexp_replace(text, '[^a-z ]', '', 'g'))
                     / length(text), 4)                       AS alpha_ratio,
               round(len(list_filter(string_split(lower(text), ' '),
                                     t -> list_contains({_STOPWORDS_SQL}, t)))
                     / len(string_split(lower(text), ' ')), 4) AS stopword_ratio,
               round(len(list_distinct(string_split(lower(text), ' ')))
                     / len(string_split(lower(text), ' ')), 4) AS distinct_ratio
        FROM documents
    )
    SELECT * FROM scored
    WHERE n_tokens BETWEEN 5 AND 2000 AND alpha_ratio >= 0.8 AND distinct_ratio >= 0.2
    """,
    tags=("llm", "text"),
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11 quality scoring + hygiene filter (length band, alpha ratio,
    repetition)."""
    docs = load(spark, sf_dir, "documents")
    return quality_scores(docs).filter(
        F.col("n_tokens").between(5, 2000)
        & (F.col("alpha_ratio") >= 0.8)
        & (F.col("distinct_ratio") >= 0.2)
    )


_MARKER_SQL = {
    "en": "['the', 'and', 'of']",
    "de": "['der', 'und', 'das']",
    "fr": "['le', 'et', 'les']",
    "es": "['el', 'y', 'los']",
    "zh": "['de', 'shi', 'le']",
}
_SCORES_SQL = ",\n".join(
    f"""           len(list_filter({markers},
                     m -> list_contains(string_split(lower(text), ' '), m)))
               AS score_{lang}"""
    for lang, markers in _MARKER_SQL.items()
)


@query(
    "llm_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
{_SCORES_SQL}
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN score_en >= score_de AND score_en >= score_fr
                     AND score_en >= score_es AND score_en >= score_zh THEN 'en'
                WHEN score_de >= score_fr AND score_de >= score_es
                     AND score_de >= score_zh THEN 'de'
                WHEN score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
                WHEN score_es >= score_zh THEN 'es'
                ELSE 'zh' END AS pred_lang,
           score_en, score_de, score_fr, score_es, score_zh
    FROM scored
    """,
    tags=("llm", "text"),
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-stopword hits per language, argmax
    with fixed tie precedence (en > de > fr > es > zh)."""
    return language_id(load(spark, sf_dir, "documents"))


@query(
    "llm_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                 AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS bpe_ish_tokens,
           length(text)                                 AS n_chars_m
    FROM documents
    """,
    tags=("llm", "text"),
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count
    (alpha runs and digit runs)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars_m"),
    )


@query(
    "llm_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))    AS fingerprint,
           sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint_sha
    FROM documents
    """,
    tags=("llm", "text"),
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical content fingerprints (md5 + sha256 over collapsed
    whitespace) — the cross-shard exact-dedup key."""
    return document_fingerprint(load(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# L10: multimodal
# --------------------------------------------------------------------------


@query(
    "llm_multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           'text/plain'        AS mime,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text)        AS payload_sha
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 binary payload + typed metadata struct, hashed/sized
    JVM-side (text bytes stand in for media payloads)."""
    media = attach_media_metadata(documents_as_media(load(spark, sf_dir, "documents")))
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("payload_sha"),
    )


# --------------------------------------------------------------------------
# sampling / splitting / packing (training-pipeline mechanics)
# --------------------------------------------------------------------------


@query(
    "llm_split_assign",
    oracle="""
    SELECT doc_id,
           CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10000 < 8000 THEN 'train'
                WHEN ((doc_id * 2654435761) % 4294967296) % 10000 < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("llm", "sampling"),
)
def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by Knuth
    multiplicative key hash — identical on every run/engine/partition
    layout (llm/sampling.py)."""
    from ..llm.sampling import split_assign

    docs = load(spark, sf_dir, "documents")
    return split_assign(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "llm_hash_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE ((doc_id * 2654435761) % 4294967296) % 10000 < 2500
    """,
    tags=("llm", "sampling"),
)
def llm_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% corpus sample by key hash (stable under
    repartitioning, unlike df.sample)."""
    from ..llm.sampling import hash_sample

    docs = load(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.25).select("doc_id", "lang")


@query(
    "llm_mix_weighted",
    oracle="""
    SELECT doc_id, 'en_heavy' AS mix_source FROM documents
    WHERE lang = 'en' AND ((doc_id * 2654435761) % 4294967296) % 10000 < 9000
    UNION ALL
    SELECT doc_id, 'rest_light' AS mix_source FROM documents
    WHERE lang <> 'en' AND ((doc_id * 2654435761) % 4294967296) % 10000 < 3000
    """,
    tags=("llm", "sampling"),
)
def llm_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: English docs kept at 90%, the rest at
    30%, hash-deterministic, tagged by source (llm/sampling.py)."""
    from ..llm.sampling import weighted_mix

    docs = load(spark, sf_dir, "documents")
    return weighted_mix(
        {
            "en_heavy": (docs.filter(F.col("lang") == "en"), 0.9),
            "rest_light": (docs.filter(F.col("lang") != "en"), 0.3),
        },
        key_col="doc_id",
    ).select("doc_id", "mix_source")


@query(
    "llm_pack_sequences",
    oracle="""
    WITH RECURSIVE sized AS (
        SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ), walk AS (
        SELECT source, rn, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS off,
               CASE WHEN n_tokens >= 1024 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS post_bin,
               CASE WHEN n_tokens >= 1024 THEN CAST(0 AS BIGINT) ELSE n_tokens END AS post_fill
        FROM sized WHERE rn = 1
        UNION ALL
        SELECT source, rn, doc_id, n_tokens, ob AS bin_id, ofs AS off,
               CASE WHEN ofs + n_tokens >= 1024 THEN ob + 1 ELSE ob END AS post_bin,
               CASE WHEN ofs + n_tokens >= 1024 THEN CAST(0 AS BIGINT) ELSE ofs + n_tokens END AS post_fill
        FROM (
            SELECT s.source, s.rn, s.doc_id, s.n_tokens,
                   CASE WHEN w.post_fill > 0 AND w.post_fill + s.n_tokens > 1024
                        THEN w.post_bin + 1 ELSE w.post_bin END AS ob,
                   CASE WHEN w.post_fill > 0 AND w.post_fill + s.n_tokens > 1024
                        THEN CAST(0 AS BIGINT) ELSE w.post_fill END AS ofs
            FROM walk w JOIN sized s ON s.source = w.source AND s.rn = w.rn + 1
        ) t
    )
    SELECT source, doc_id, n_tokens, bin_id, off AS "offset" FROM walk
    """,
    tags=("llm", "packing"),
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 1024-token bins per source shard —
    a prefix-dependent recurrence (a bin closes when the next doc would
    overflow it), so the engine runs it as applyInPandas per shard; the
    oracle states the SAME recurrence as a recursive-CTE row walk per
    source, making this exactly checkable (it was rows-only before).
    Invariants are additionally unit-tested in tests/test_llm.py."""
    from ..llm.packing import pack_documents

    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    return pack_documents(docs, budget=1024)


@query(
    "llm_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           round(CAST(CAST(CAST('0x' || substr(sha256(text), 1, 8) AS UBIGINT)
                           / 4294967296.0 AS FLOAT) AS DOUBLE), 6) AS f0
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 feature extraction over binary payloads via mapInPandas
    (decode stage stubbed deterministically — no codec libs here; the
    Arrow batching, schema, and partitioning are the real article).
    The deterministic stand-in (first 4 sha256 digest bytes / 2^32,
    stored float32) is restated by the oracle digest-for-digest, so the
    whole binary pipeline — payload encode, Arrow transfer, batch
    feature extraction — is exactly checkable (it was rows-only
    before). f0 goes through an explicit float->double cast on both
    sides so 32-bit storage rounds identically."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


# --------------------------------------------------------------------------
# training-pipeline hygiene: contamination / redaction / dup clusters
# --------------------------------------------------------------------------


@query(
    "llm_contamination",
    oracle="""
    WITH split AS (
        SELECT doc_id, text,
               ((doc_id * 2654435761) % 4294967296) % 10000 AS b
        FROM documents
    ), toks AS (
        SELECT doc_id, b, string_split(lower(text), ' ') AS tk FROM split
    ), grams AS (
        SELECT DISTINCT doc_id, b,
               unnest(list_transform(range(1, len(tk) - 3),
                      i -> list_aggregate(tk[i:i+4], 'string_agg', ' '))) AS gram
        FROM toks
    ), train AS (
        SELECT DISTINCT gram FROM grams WHERE b < 8000
    ), test AS (
        SELECT doc_id, gram FROM grams WHERE b >= 9000
    ), shared AS (
        SELECT doc_id, count(*) AS n_shared
        FROM test JOIN train USING (gram) GROUP BY doc_id
    ), sizes AS (
        SELECT doc_id, count(*) AS n_grams FROM test GROUP BY doc_id
    )
    SELECT doc_id, n_shared, n_grams,
           round(n_shared / CAST(n_grams AS DOUBLE), 4) AS ratio
    FROM shared JOIN sizes USING (doc_id)
    """,
    tags=("llm", "hygiene"),
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination: test-split documents sharing token
    5-grams with any train-split document (the n-gram collision
    standard for LLM leakage detection). Train grams collapse to
    DISTINCT before the join — one row per gram regardless of how many
    train docs carry it, so there is no hot-gram blowup by
    construction."""
    from ..llm.dedup import cross_split_contamination

    docs = load(spark, sf_dir, "documents")
    return cross_split_contamination(docs, n=5)


@query(
    "llm_pii_redact",
    oracle="""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com or 555-867-5309 now'
                    ELSE text END AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))
               AS n_emails,
           len(regexp_extract_all(text, '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b'))
               AS n_phones,
           md5(regexp_replace(
                   regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                                  '<EMAIL>', 'g'),
                   '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g'))
               AS redacted_md5,
           (len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))
            + len(regexp_extract_all(text, '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')))
               > 0 AS was_redacted
    FROM planted
    """,
    tags=("llm", "hygiene"),
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus. The fixture text carries no PII,
    so every tenth document gets a deterministic planted email + phone
    first (planted-PII evaluation, mirrored in the oracle); the redact
    pass then replaces matches with typed placeholders and reports
    match counts + the scrubbed-content digest. Pure JVM regex, no
    shuffle."""
    from ..llm.text import pii_redact

    docs = load(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-5309 now"),
            ),
        ).otherwise(F.col("text")),
    )
    return pii_redact(planted)


@query(
    "llm_dedup_clusters",
    oracle="""
    WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
    aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT o FROM off), text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2 * (SELECT o FROM off), text FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster_id
    FROM aug
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: cluster_id = min(doc_id) among documents
    with identical content. Fixture texts are all distinct, so
    duplicate chains are planted first (copies at +off / +2*off,
    off = max(doc_id)+1 via a parameter-only collect so planted ids
    never collide with real ones, for every 10th / 20th doc —
    components of size up to 3). Round 10 re-planned the operator
    itself (llm/dedup.connected_dedup_clusters): exact-duplicate
    clusters ARE fingerprint groups — content equality is transitive
    already — so the component minimum is one windowed min over the
    md5 fingerprint (one exchange of (id, 16 B)), not an iterative
    label-propagation loop; the widened 100x tier priced the loop at
    10.0 s / 41.6x for what one window does in ~1 s. Genuinely
    transitive edge relations keep the iterative operator
    (llm_dedup_survivors, graph_connected_components)."""
    from ..llm.dedup import connected_dedup_clusters

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    offset = docs.agg(F.max("doc_id")).first()[0] + 1
    aug = (
        docs.unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + F.lit(offset)).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + F.lit(2 * offset)).alias("doc_id"), "text"
            )
        )
    )
    return connected_dedup_clusters(aug)


@query(
    "llm_doc_chunk",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / 150.0) AS BIGINT))) AS chunk_id
        FROM documents
    )
    SELECT doc_id, chunk_id,
           substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text
    FROM idx
    """,
    tags=("llm", "text"),
)
def llm_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline chunking: 200-char windows at stride 150
    (50-char overlap) per document (llm/text.py chunk_documents)."""
    from ..llm.text import chunk_documents

    return chunk_documents(load(spark, sf_dir, "documents"))


@query(
    "llm_repetition_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ), cnt AS (
        SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id, round(max(c) * 1.0 / sum(c), 4) + 0.0 AS top_token_ratio
    FROM cnt GROUP BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def llm_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: most-frequent-token mass
    fraction per document (llm/text.py repetition_scores)."""
    from ..llm.text import repetition_scores

    return repetition_scores(load(spark, sf_dir, "documents"))


@query(
    "llm_vector_centroid",
    oracle="""
    SELECT label, dim, round(avg(v), 6) + 0.0 AS centroid
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) - 1 AS dim
          FROM embeddings)
    GROUP BY label, dim
    """,
    tags=("llm", "similarity"),
)
def llm_vector_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid in exploded (label, dim, centroid)
    form — the cluster-statistics step of IVF training / corpus
    analysis (llm/similarity.py label_centroids)."""
    from ..llm.similarity import label_centroids

    return label_centroids(load(spark, sf_dir, "embeddings"))


@query(
    "llm_multimodal_frames",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, text, length(text) AS n
        FROM documents
    ), idx AS (
        SELECT media_id, text,
               unnest(range(0, least(4, greatest(1, CAST(ceil(n / 256.0) AS BIGINT)))))
                   AS frame_idx
        FROM media
    )
    SELECT media_id,
           CAST(frame_idx AS INT)                              AS frame_idx,
           CAST(frame_idx * 1000 // 25 AS BIGINT)              AS frame_ts_ms,
           CAST(length(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS BIGINT)
               AS n_frame_bytes,
           sha256(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_sha256
    FROM idx
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 frame sampling: up to 4 strided 256-byte "frames" per media
    payload with fake 25 fps timestamps (llm/multimodal.py
    sample_frames; the byte-slice decode is the documented codec stub —
    fixture text is ASCII so the DuckDB VARCHAR-substring oracle slices
    the same bytes)."""
    from ..llm.multimodal import documents_as_media, sample_frames

    media = documents_as_media(load(spark, sf_dir, "documents"))
    return sample_frames(media)


@query(
    "llm_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY ((doc_id * 2654435761) % 4294967296) % 10000, doc_id
               ) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ) WHERE rn <= ceil(0.2 * n)
    """,
    tags=("llm", "sampling"),
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-proportion 20% sample per language stratum, key-hash
    ordered (llm/sampling.py stratified_sample) — hash_sample's
    variance-free sibling for training-mix proportions."""
    from ..llm.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    return stratified_sample(docs, ["lang"], "doc_id", 0.2).select("doc_id", "lang")


@query(
    "llm_edit_distance_verify",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, source, string_split(lower(text), ' ') AS tk
        FROM documents
    ), grams_all AS (
        SELECT DISTINCT doc_id, lang, source,
               unnest(list_transform(range(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
        FROM toks
    ), grams AS (
        SELECT * FROM (
            SELECT g.*, count(*) OVER (PARTITION BY lang, source, gram) AS df
            FROM grams_all g
        ) WHERE df <= 100
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM grams a JOIN grams b
          ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
        WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           levenshtein(da.text, db.text) AS lev_dist,
           round(1.0 - levenshtein(da.text, db.text)
                       / greatest(length(da.text), length(db.text)), 4) + 0.0 AS lev_sim
    FROM cand
    JOIN documents da ON da.doc_id = id_a
    JOIN documents db ON db.doc_id = id_b
    """,
    tags=("llm", "dedup"),
)
def llm_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify stage over scale-safe candidates: pairs
    sharing any df-capped 3-gram (the same candidate generator as
    llm_jaccard_ngram — never all-pairs) scored with JVM levenshtein
    and a length-normalized similarity."""
    docs = load(spark, sf_dir, "documents")
    cand = ngram_jaccard_pairs(
        docs, n=3, scope_cols=["lang", "source"], df_cap=100, pairs_only=True,
        fanout_partitions=fanout_width(spark, sf_dir, "documents", expansion=288),
    )
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein("text_a", "text_b")
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            lev.alias("lev_dist"),
            (
                F.round(
                    1.0 - lev / F.greatest(F.length("text_a"), F.length("text_b")), 4
                )
                + F.lit(0.0)
            ).alias("lev_sim"),
        )
    )


import numpy as np  # noqa: E402 — module level for pandas_udf type hints
import pandas as pd  # noqa: E402


def _char_entropy_udf():
    # built lazily: pandas_udf resolves its DDL return type against the
    # active session, which does not exist at module-import time
    @F.pandas_udf("double")
    def fn(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(None)
                continue
            _, cnt = np.unique(np.array(list(t)), return_counts=True)
            p = cnt / cnt.sum()
            out.append(float(-(p * np.log(p)).sum()))
        return pd.Series(out, dtype="float64")

    return fn


@query(
    "llm_char_entropy",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        FROM documents WHERE length(text) > 0
    ), freq AS (
        SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS ch, count(*) AS c
        FROM idx GROUP BY doc_id, substr(text, CAST(i AS INTEGER), 1)
    ), tot AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM freq GROUP BY doc_id
    )
    SELECT f.doc_id,
           round(-sum((f.c * 1.0 / t.n) * ln(f.c * 1.0 / t.n)), 6) AS char_entropy
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — a standard
    gibberish / low-information quality signal. Scale shape: entropy is
    a pure per-row function of the text, so the Spark path is a
    vectorized Arrow pandas UDF with NO shuffle at all (embarrassingly
    parallel over 100 TB); the oracle cross-checks via the explicit
    explode-and-aggregate SQL formulation. Rounded at 6dp: numpy and
    the SQL engine sum the ~alphabet-sized term list in different
    orders (noise ~1e-15 relative)."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return docs.select(
        "doc_id", F.round(_char_entropy_udf()(F.col("text")), 6).alias("char_entropy")
    )


@query(
    "llm_keywords",
    oracle="""
    WITH terms AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), df_ AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * (ln((n.n_docs + 1) / (df_.df + 1)) + 1), 4) AS tfidf
        FROM tf JOIN df_ USING (term), n
    )
    SELECT doc_id, term, tfidf, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
    tags=("llm", "text"),
)
def llm_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms per document with the
    deterministic (4dp score desc, term asc) tiebreak.

    Round 11 re-plan (verdict item 2): the windowed plan over
    ``tfidf`` — JVM regex split + explode + (doc, term) exchange +
    full-table window sort — read 8.12 s / 4.84x DuckDB at the 100x
    tier. Now the document-level two-Arrow-pass shape
    (``keywords_topk``, the heavy_hitters_docs pattern): pass 1 lands
    the vocab-bounded df vector, pass 2 emits exactly 3 rows per
    document, no full-size exchange anywhere."""
    docs = load(spark, sf_dir, "documents")
    return keywords_topk(docs, k=3)


@query(
    "llm_clean_corpus",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, source, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(lower(text)) AS content_key
        FROM documents
    ), filtered AS (
        SELECT * FROM scored
        WHERE n_chars >= 100 AND n_tokens BETWEEN 15 AND 80
          AND lang IN ('en', 'de', 'fr', 'es')
    ), dedup AS (
        SELECT *, row_number() OVER (PARTITION BY content_key ORDER BY doc_id) AS rn
        FROM filtered
    )
    SELECT doc_id, lang, source, n_chars, n_tokens FROM dedup WHERE rn = 1
    """,
    tags=("llm", "pipeline"),
)
def llm_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning recipe — the composition a training-
    data pipeline actually runs: size/token-count quality gates ->
    language allowlist -> exact dedup on the normalized-content hash
    (deterministic min-doc_id survivor). Near-dup removal composes on
    top via the registered minhash/simhash/jaccard keys. One shuffle
    total (the content-hash window); the quality and language gates are
    pushed-down scan filters. Replacing the window with groupBy+min_by
    was probed at the 100x tier and is a WASH (AB_R12B_100X: medians
    1.43 vs 2.09 s, mins 1.36 vs 1.42 — the per-partition sort it
    avoids is cheap at five scalar columns), so the window shape
    ships."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.lower(F.col("text"))).alias("content_key"),
    )
    filtered = scored.filter(
        (F.col("n_chars") >= 100)
        & F.col("n_tokens").between(15, 80)
        & F.col("lang").isin("en", "de", "fr", "es")
    )
    w = Window.partitionBy("content_key").orderBy("doc_id")
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "n_tokens")
    )


@query(
    "llm_containment_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, source, string_split(lower(text), ' ') AS tk
        FROM documents
    ), grams_all AS (
        SELECT DISTINCT doc_id, lang, source,
               unnest(list_transform(range(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
        FROM toks
    ), grams AS (
        SELECT * FROM (
            SELECT g.*, count(*) OVER (PARTITION BY lang, source, gram) AS df
            FROM grams_all g
        ) WHERE df <= 100
    ), sizes AS (
        SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM grams a JOIN grams b
          ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
           round(n_inter / (sa.n_grams + sb.n_grams - n_inter), 4) AS jaccard,
           round(n_inter / sa.n_grams, 4) AS containment_a,
           round(n_inter / sb.n_grams, 4) AS containment_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    """,
    tags=("llm", "dedup"),
)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment alongside Jaccard for candidate pairs —
    the signal for SUB-document duplication (a quote or boilerplate
    block inside a larger doc scores high containment but low Jaccard).
    Same df-capped gram machinery as llm_jaccard_ngram; containment is
    two extra ratio columns off the same intersection aggregate."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, scope_cols=["lang", "source"], df_cap=100, include_containment=True,
        fanout_partitions=fanout_width(spark, sf_dir, "documents", expansion=288),
    )


@query(
    "llm_vector_quantize",
    oracle="""
    WITH base AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), stats AS (
        SELECT vec_id, label, v,
               sqrt(list_sum(list_transform(v, x -> x * x)))     AS norm,
               list_max(list_transform(v, x -> abs(x))) / 127.0  AS scale
        FROM base
    )
    SELECT vec_id, label,
           round(norm, 4)  AS norm,
           round(scale, 6) AS scale,
           array_to_string(
               list_transform(v, x -> CAST(CAST(floor(
                   CASE WHEN scale = 0 THEN 0.0 ELSE x / scale END + 0.5)
                   AS BIGINT) AS VARCHAR)), ',') AS q8
    FROM stats
    """,
    tags=("llm", "vector"),
)
def llm_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norm + symmetric int8 quantization (the storage-compression
    step before ANN indexing at 100 TB: 4x smaller embeddings, scale
    factor kept per row). Pure JVM higher-order functions — no shuffle,
    no Python. Quantization rounds via floor(x+0.5), which both engines
    evaluate identically (no round() midpoint divergence); the int8
    codes are served as a joined string per the array-output
    convention."""
    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    stats = base.select(
        "vec_id",
        "label",
        "v",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)).alias("norm"),
        (F.array_max(F.transform("v", lambda x: F.abs(x))) / 127.0).alias("_scale_raw"),
    )
    # NB: the raw scale column must NOT share a name with the rounded
    # output alias — Spark's lateral column alias resolution would bind
    # the lambda's reference to the ROUNDED value (silently quantizing
    # with a 6dp-truncated scale).
    raw = F.col("_scale_raw")
    quant = F.transform(
        "v",
        lambda x: F.floor(
            F.when(raw == 0, F.lit(0.0)).otherwise(x / raw) + 0.5
        ).cast("string"),
    )
    return stats.select(
        "vec_id",
        "label",
        F.round("norm", 4).alias("norm"),
        F.round("_scale_raw", 6).alias("scale"),
        F.concat_ws(",", quant).alias("q8"),
    )


@query(
    "llm_segment_dedup",
    oracle="""
    WITH seg AS (
        SELECT doc_id,
               array_to_string(
                   ws[CAST(i*3+1 AS BIGINT) : CAST(i*3+3 AS BIGINT)], ' ') AS seg_text
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
             unnest(range(CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS t(i)
    ), freq AS (
        SELECT seg_text, count(DISTINCT doc_id) AS ndocs FROM seg GROUP BY 1
    )
    SELECT s.doc_id,
           count(*) AS total_segs,
           CAST(sum(CASE WHEN f.ndocs <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs
    FROM seg s JOIN freq f USING (seg_text)
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
    tags=("llm", "dedup", "text"),
)
def llm_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/Gopher-style cross-document segment dedup: split each
    document into fixed-width word segments, count each segment's
    document frequency across the corpus, and drop segments appearing
    in more than 2 documents (boilerplate). Output is the per-document
    keep audit (total vs surviving segments).

    Scale shape: segmentation is pure JVM array code (split +
    sequence/transform/slice — no Python, no shuffle); the corpus pass
    is TWO shuffles total (optimization round 13): one fanout-width
    exchange on seg_text that serves both the per-(segment, doc)
    multiplicity aggregate and the document-frequency window over it,
    and one back on doc_id. The previous shape aggregated df with a
    count_distinct and joined it back onto a SECOND evaluation of the
    exploded segmentation — the segmentation (an interpreted
    higher-order transform) ran twice and the corpus crossed three
    exchanges. The (seg_text, doc_id) rows are distinct after the
    multiplicity aggregate, so a plain count window over seg_text IS
    the distinct document frequency; per-document totals then reduce
    from the multiplicities. Hot boilerplate segments are exactly the
    rows the filter removes, so the skew they cause is bounded by the
    ndocs count itself (and the window group is the same cardinality
    the old count_distinct aggregate carried per key)."""
    from pyspark.sql import Window

    from ..catalog import fanout_width

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    nseg = F.ceil(F.size(words) / F.lit(3.0)).cast("int")
    segments = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(words, i * 3 + 1, 3), " "),
    )
    seg = docs.select("doc_id", F.explode(segments).alias("seg_text"))
    # hashpartitioning(seg_text) satisfies both the (seg_text, doc_id)
    # aggregate's clustering and the window's partitionBy — one
    # exchange, width scaled to the exploded output (segments fan out
    # ~wordcount/3 per document)
    pairs = (
        seg.repartition(fanout_width(spark, sf_dir, "documents"), "seg_text")
        .groupBy("seg_text", "doc_id")
        .agg(F.count(F.lit(1)).alias("__mult"))
    )
    ndocs = F.count(F.lit(1)).over(Window.partitionBy("seg_text"))
    return (
        pairs.withColumn("ndocs", ndocs)
        .groupBy("doc_id")
        .agg(
            F.sum("__mult").alias("total_segs"),
            F.sum(F.when(F.col("ndocs") <= 2, F.col("__mult")).otherwise(0)).alias(
                "kept_segs"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_knn_rerank",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings ORDER BY vec_id LIMIT 1
    ), qs AS (
        SELECT qv,
               list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qscale,
               sqrt(list_sum(list_transform(qv, x -> x * x))) AS qnorm
        FROM q
    ), q8 AS (
        SELECT qv, qscale, qnorm,
               list_transform(qv, x -> CASE WHEN x >= 0
                    THEN CAST(floor(x / qscale + 0.5) AS BIGINT)
                    ELSE -CAST(floor(-x / qscale + 0.5) AS BIGINT) END) AS q8v
        FROM qs
    ), stats AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        FROM embeddings
    ), scored AS (
        SELECT s.vec_id, s.v, s.norm, s.scale,
               list_sum(list_transform(range(1, len(s.v) + 1),
                   i -> CAST(floor(CASE WHEN s.scale = 0 THEN 0.0
                                        ELSE s.v[i] / s.scale END + 0.5) AS BIGINT)
                        * t.q8v[i]))
                 * s.scale * t.qscale
                 / CASE WHEN s.norm = 0 THEN 1.0 ELSE s.norm END AS approx_score
        FROM stats s CROSS JOIN q8 t
    ), cand AS (
        SELECT * FROM scored ORDER BY approx_score DESC, vec_id LIMIT 50
    )
    SELECT c.vec_id,
           round(list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * t.qv[i]))
                 / (c.norm * t.qnorm), 4) + 0 AS score
    FROM cand c CROSS JOIN q8 t
    ORDER BY score DESC, c.vec_id
    LIMIT 10
    """,
    tags=("llm", "similarity", "approx"),
)
def llm_knn_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: int8-quantized dot-product prefilter keeps
    a 5x candidate pool, exact double-precision cosine reranks the
    final top-10. The whole computation — per-vector symmetric-max
    quantization, integer dot, deterministic (score, vec_id) cuts — is
    deterministic, so the oracle restates it literally with DuckDB
    list lambdas and the key is exactly hash-checkable (it was
    rows-only before); int8 recall vs brute force is additionally
    unit-tested in tests/test_llm.py.

    Scale shape: stage 1 scores the full corpus with int8 arithmetic —
    4x less memory bandwidth than float32, the reason production ANN
    serves quantized — and reduces via TakeOrderedAndProject (no full
    sort). Stage 2 touches only the 50-row candidate pool, so its cost
    is independent of corpus size."""
    from ..llm.similarity import cosine_score, lit_num_array

    emb = load(spark, sf_dir, "embeddings")
    qrow = (
        emb.orderBy("vec_id").select("embedding").limit(1).collect()[0][0]
    )  # parameter-only collect: the query vector itself
    qv = [float(x) for x in qrow]
    qscale = max(abs(x) for x in qv) / 127.0 or 1.0
    q8 = [int(x / qscale + 0.5) if x >= 0 else -int(-x / qscale + 0.5) for x in qv]

    v = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", v.alias("v"))
    scale = F.array_max(F.transform("v", lambda x: F.abs(x))) / 127.0
    stats = base.select(
        "vec_id",
        "v",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)).alias("norm"),
        scale.alias("scale"),
    )
    raw = F.col("scale")
    v8 = F.transform(
        "v",
        lambda x: F.floor(F.when(raw == 0, F.lit(0.0)).otherwise(x / raw) + 0.5).cast(
            "long"
        ),
    )
    q8_lit = lit_num_array(q8)
    approx_dot = F.aggregate(
        F.zip_with(v8, q8_lit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    # ranking-equivalent approx cosine: query norm is a shared constant
    approx = (approx_dot * raw * F.lit(qscale)) / F.when(
        F.col("norm") == 0, F.lit(1.0)
    ).otherwise(F.col("norm"))
    cand = (
        stats.withColumn("approx_score", approx)
        .orderBy(F.col("approx_score").desc(), "vec_id")
        .limit(50)
    )
    q_lit = lit_num_array(qv)
    return (
        cand.withColumn("score", F.round(cosine_score(F.col("v"), q_lit), 4) + F.lit(0.0))
        .select("vec_id", "score")
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(10)
    )


@query(
    "llm_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), vocab AS (
        SELECT word, count(*) AS c FROM tok GROUP BY word
    ), total AS (
        SELECT sum(c) AS n FROM vocab
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(-ln(v.c / tt.n)), 4) AS avg_neg_logprob
    FROM tok t JOIN vocab v USING (word) CROSS JOIN total tt
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: train a corpus unigram LM (one
    count pass) and score each document by mean negative log
    probability — the cheap first-pass fluency signal production
    pipelines run before an actual LM (high values = rare-token soup,
    candidates for dropping).

    Scale shape: tokenize once, two shuffles (word for the LM, doc_id
    for the score), corpus total broadcast as a 1-row cross join; every
    expression is JVM-side. The vocab join is the hot path and is
    skew-safe: partial aggregation collapses repeated words per
    partition before the exchange."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    return (
        tok.join(vocab, "word")
        # bounded: 1-row corpus total
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


@query("llm_dedup_survivors", oracle=None, tags=("llm", "dedup", "approx"))
def llm_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end near-dup dedup a training pipeline actually
    ships: MinHash-LSH candidate pairs -> connected components (min-
    label propagation over the pair edges) -> keep the lowest doc_id
    per component -> emit the surviving corpus. Rows-only (MinHash is
    approximate); chain recall and survivor invariants are unit-tested
    against planted duplicates in tests/test_llm.py.

    Scale shape: pairs come from banded LSH (never all-pairs), the
    component walk is the shared convergence-exit min-label propagation
    (operators/labelprop.py — one join + one grouped min per round over
    the candidate-pair edge set, which is tiny relative to the corpus,
    localCheckpoint per round), and the final keep is a broadcast
    anti-join of losers against the corpus. The planted-copy id offset
    is derived from max(doc_id) — a parameter-only scalar collect — so
    planted ids can never collide with real ones at any scale factor.

    Components, not pairs (round 11, verdict item 3): this pipeline's
    ONLY consumer of the pair stream is connected components, and a
    component needs SPANNING connectivity, never the full pair
    enumeration — so the LSH bucket cap runs at 64 instead of the
    pair-semantics default 1000. Any band bucket wider than 64 emits
    anchor stars (bucket anchor + per-signature-group anchors, see
    llm/dedup.py) in place of the O(|bucket|^2) self-join; a true
    duplicate clique stays one component because every member verifies
    against a shared anchor. On the duplicate-dense 100x tier (500k
    docs in 100-cliques) this cuts the edge relation from ~33M
    verified pairs (x2 directions, each dragging two 32-long
    signatures through the verify join) to ~corpus-linear, which is
    what let the key OOM a task under the 8 GB local heap's
    concurrent-sweep pressure before. 64 is a MEASURED point on the
    recall/scale curve (same session, same fixtures, /tmp/cap_ab):
    cap 1000 removes 2556 dups at sf0.1 but takes 453.5 s on the
    clique-dense 100x tier; cap 64 keeps 83% of that removal (2120)
    at 54.5 s; cap 16 keeps 62% at 66.9 s (slower AND blinder — the
    extra starred mid-size buckets emit mostly verify-failing pairs).
    What the cap costs is near-dup-but-not-identical pairs inside
    >64-wide mixed buckets — exact dups are cap-immune via the
    signature-group stars, and planted chain recall is unit-tested.
    Round 12 adds ``second_chance=True``: sorted-neighborhood chaining
    inside hot buckets (members sorted by full signature, each paired
    with its next K successors) recovers mixed-bucket near-dup pairs
    the cap forfeits at O(K x |bucket|) cost — see
    minhash_near_dup_pairs' docstring and AB_SURVIVORS_r12.json,
    which also records the fresh-permutation re-banding dead end."""
    from ..operators.labelprop import propagate_min_labels

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # plant duplicate chains so the pipeline has real work at any sf
    offset = docs.agg(F.max("doc_id")).first()[0] + 1
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + F.lit(offset)).alias("doc_id"), "text"
        )
    )
    pairs = minhash_near_dup_pairs(
        aug, jaccard_threshold=0.5, max_bucket_docs=64, second_chance=True
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # EAGER checkpoint (optimization round 13): labelprop's first round
    # launches broadcast-exchange futures concurrently with its main
    # stages and both sides read this relation — on a lazy checkpoint
    # the concurrent first readers race and each recomputes the whole
    # LSH pipeline upstream (REST job profile: twin ~0.69 s broadcast
    # jobs doing identical work). One dedicated materialization job
    # serializes that work exactly once.
    und = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    # seed each node with min(self, min neighbour) — one grouped min
    # over the edge set, equivalent to pre-running one relax round but
    # without its compress join and convergence-count job. Near-dup
    # components are overwhelmingly pairs/small stars, so propagation
    # then confirms convergence in a single round instead of doing the
    # first relax itself (sound: the seed label is always the id of a
    # node inside the same component).
    labels = (
        und.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.min("dst"), F.min("src")).alias("component"))
    )
    labels = propagate_min_labels(und, labels, "node", "component", max_rounds=50)
    losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return (
        # losers scales with the duplicate population (linear in corpus
        # size), so the anti-join is not force-broadcast: AQE broadcasts
        # it while observed-small and shuffles at scale.
        aug.join(losers, "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


@query("llm_topic_cluster", oracle=None, tags=("llm", "similarity", "approx"))
def llm_topic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus topic clustering: seeded Lloyd k-means over the embedding
    column (llm/similarity.py train_centroids — only k x dim means ever
    reach the driver), then nearest-centroid assignment as a broadcast
    numpy projection, rolled up to cluster membership + per-cluster
    mean distance-to-center proxy (avg cosine to the assigned
    centroid). Rows-only: centroid identity depends on the seeded
    initialization, not on an ANSI-expressible fixpoint; assignment
    determinism is covered by the IVF recall test over the same
    machinery.

    Scale shape: training is iterations x one-scan posexplode
    aggregations; assignment is shuffle-free (centroid matrix in the
    task closure); the rollup is one groupBy on k keys."""
    from ..llm.similarity import assign_to_centroids, train_centroids

    emb = load(spark, sf_dir, "embeddings")
    centroids = train_centroids(emb, n_centroids=8, iterations=2)
    assigned = assign_to_centroids(emb, centroids, "embedding")
    from ..llm.similarity import _param_relation, cosine_score

    cent_df = _param_relation(spark, sorted(centroids), "centroid_id", "centroid")

    return (
        # bounded: k centroid parameter rows
        assigned.join(F.broadcast(cent_df), "centroid_id")
        .withColumn(
            "cos", cosine_score(F.transform("embedding", lambda x: x.cast("double")), F.col("centroid"))
        )
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (F.round(F.avg("cos"), 4) + F.lit(0.0)).alias("avg_cos_to_center"),
        )
        .orderBy("centroid_id")
    )


@query(
    "llm_length_percentile_trim",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               cume_dist() OVER (PARTITION BY lang ORDER BY n_chars) AS cd
        FROM documents
    )
    SELECT doc_id, lang, n_chars, round(cd, 6) AS length_pctile
    FROM ranked WHERE cd >= 0.05 AND cd <= 0.95
    """,
    tags=("llm", "text", "filter"),
)
def llm_length_percentile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-percentile corpus trim: drop the shortest
    5% and longest 5% of documents WITHIN each language — the standard
    outlier cut before training-mix assembly (absolute length bands
    like llm_quality_filter's misfire across languages whose scripts
    have different chars-per-token).

    Scale shape: cume_dist needs no second pass or percentile collect
    — one shuffle on lang, one in-partition sort; ties share a rank so
    the cut is deterministic under any row order. Skewed language
    sizes (English is always most of a web corpus) are the classic
    single-hot-partition case: at 100 TB, pre-aggregate to
    (lang, n_chars) counts first — same trick as
    agg_exact_median_distributed — and broadcast the tiny threshold
    table back onto the docs."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    cd = F.cume_dist().over(w)
    return (
        docs.select(
            "doc_id", "lang", "n_chars", F.round(cd, 6).alias("length_pctile"), cd.alias("_cd")
        )
        .filter((F.col("_cd") >= 0.05) & (F.col("_cd") <= 0.95))
        .drop("_cd")
    )


@query(
    "llm_shuffle_shard",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               (((doc_id + 1) * 2654435761) % 4294967296) AS hv
        FROM documents
    )
    SELECT doc_id,
           CAST(hv % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1
                AS BIGINT) AS pos_in_shard
    FROM h
    """,
    tags=("llm", "sampling", "custom-operator"),
)
def llm_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a shard (hash-routed, so shards are balanced and reshuffling is a
    salt change) and a position within its shard (hash-ordered, so the
    read order inside each shard is decorrelated from ingest order) —
    the (shard, position) layout a dataloader consumes. Crucially there
    is NO global row_number: ordering is per-shard, so the sort
    parallelizes across shards instead of collapsing onto one reducer —
    the difference between shuffling 100 TB and shuffling one
    partition. The epoch salt here is the +1 in the Knuth hash."""
    docs = load(spark, sf_dir, "documents")
    hv = ((F.col("doc_id") + 1) * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        docs.select("doc_id", hv.alias("hv"))
        .withColumn("shard", (F.col("hv") % 8).cast("long"))
        .select(
            "doc_id",
            "shard",
            (F.row_number().over(w) - 1).cast("long").alias("pos_in_shard"),
            "hv",
        )
        .drop("hv")
    )


@query(
    "llm_multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS orig_bytes,
           octet_length(encode(substr(text, 1,
               CAST(ceil(length(text) / 2.0) AS BIGINT)))) AS resized_bytes,
           sha256(substr(text, 1,
               CAST(ceil(length(text) / 2.0) AS BIGINT))) AS resized_sha
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 resize stage: mapInPandas over binary payloads with the
    decode->kernel->encode step stubbed deterministically (half the
    code points — no codec libs in this container; the Arrow batch
    shape, schema, and memory bounds are the real article, shared with
    extract_features). The oracle restates the transform digest-for-
    digest, so the full binary round trip is exactly checkable."""
    from ..llm.multimodal import documents_as_media, resize_media

    media = documents_as_media(load(spark, sf_dir, "documents"))
    return resize_media(media, num=1, den=2)


@query(
    "llm_multimodal_decode",
    oracle="""
    WITH base AS (
        SELECT doc_id AS media_id,
               16 AS width,
               CAST(4 + doc_id % 8 AS INT) AS height,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS channels
        FROM documents
    ), v AS (
        SELECT media_id, width, height,
               (media_id * 31 + unnest(range(0, width * height * channels))) % 256 AS val
        FROM base
    )
    SELECT media_id,
           CAST(any_value(width) AS INT)   AS width,
           CAST(any_value(height) AS INT)  AS height,
           CAST(count(*) AS BIGINT)        AS n_values,
           CAST(sum(val) AS BIGINT)        AS px_sum,
           CAST(min(val) AS INT)           AS px_min,
           CAST(max(val) AS INT)           AS px_max,
           round(sum(val) * 1.0 / count(*), 6) AS px_mean
    FROM v GROUP BY media_id
    """,
    tags=("llm", "multimodal"),
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 decode stage with a REAL image parser: one deterministic
    netpbm image per document (even ids PGM/P5 grayscale, odd ids
    PPM/P6 RGB, varying heights) is synthesized, pushed through the
    pure-Python decoder (llm/multimodal.py decode_image), and reduced
    to pixel statistics — all on executors via mapInPandas, zero
    shuffle. The gradient pixel law is closed-form, so the oracle
    recomputes every statistic in SQL with no image code: any parser
    defect (header offset, channel order, truncation) breaks the hash
    match."""
    from ..llm.multimodal import decode_pixel_stats

    ids = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))
    return decode_pixel_stats(ids)


@query(
    "llm_url_dedup",
    oracle="""
    SELECT 'https://www.example.com/p/' || CAST(doc_id // 5 AS VARCHAR)
               AS canonical_url,
           CAST(count(*) AS BIGINT)  AS n_variants,
           min(doc_id)               AS survivor_doc_id
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "dedup", "text"),
)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the first pass of every web-corpus
    pipeline (the bulk of crawl duplicates are the SAME page under
    cosmetic URL variants, caught here for the cost of string ops
    before any content hashing runs). Five deterministic messy
    variants are synthesized per document (case-mangled scheme/host,
    default :443 port, fragment, utm_* tracking params, trailing
    slash; page id = doc_id/5 so variant groups genuinely collide),
    then canonicalized with JVM-side regex/array ops only — lowercase
    scheme+host, strip default port, drop fragment, drop utm_* params,
    strip the trailing slash — and reduced to one survivor per
    canonical URL. The oracle states the canonical form from the
    generative schema, so any canonicalization defect (port left in,
    fragment kept, utm filter too broad) hash-mismatches.

    Scale shape: pure narrow transforms + ONE groupBy on the canonical
    key; no Python, no join, no window."""
    docs = load(spark, sf_dir, "documents")
    page = (F.col("doc_id") / 5).cast("long")
    v = F.col("doc_id") % 5
    base = F.concat(F.lit("https://www.example.com/p/"), page)
    messy = (
        F.when(v == 0, base)
        .when(v == 1, F.concat(F.lit("https://WWW.EXAMPLE.COM/p/"), page, F.lit("/")))
        .when(v == 2, F.concat(F.lit("https://www.example.com:443/p/"), page, F.lit("#frag")))
        .when(
            v == 3,
            F.concat(base, F.lit("?utm_source=news&utm_campaign=x")),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://WwW.eXaMpLe.CoM:443/p/"), page, F.lit("/?utm_medium=z#top")
            )
        )
    )
    no_frag = F.regexp_replace(messy, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z]+)://", 1))
    rest = F.regexp_replace(no_frag, r"^[A-Za-z]+://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.lower(F.regexp_replace(hostport, r":443$", ""))
    pathq = F.expr(
        "substr(regexp_replace(regexp_replace(messy, '#.*$', ''), '^[A-Za-z]+://', ''),"
        " length(regexp_extract(regexp_replace(regexp_replace(messy, '#.*$', ''),"
        " '^[A-Za-z]+://', ''), '^([^/?]+)', 1)) + 1)"
    )
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/$", "")
    query_str = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept_params = F.array_join(
        F.filter(
            F.split(query_str, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept_params != "", F.concat(F.lit("?"), kept_params)).otherwise(F.lit("")),
    )
    return (
        docs.withColumn("messy", messy)
        .withColumn("canonical_url", canon)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("survivor_doc_id"),
        )
    )


@query(
    "llm_domain_quota",
    oracle="""
    WITH ranked AS (
        SELECT source || '.example.com' AS domain, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT domain,
           CAST(count(*) AS BIGINT)                         AS n_docs,
           CAST(sum(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > 100 THEN 1 ELSE 0 END) AS BIGINT)  AS n_dropped,
           max(CASE WHEN rn <= 100 THEN doc_id END)         AS boundary_doc_id,
           CAST(sum(CASE WHEN rn <= 100 THEN n_chars ELSE 0 END) AS BIGINT)
                                                            AS kept_chars
    FROM ranked GROUP BY domain
    """,
    tags=("llm", "sampling", "text"),
)
def llm_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the anti-monoculture quota every
    web-corpus recipe applies (Common Crawl curation caps pages per
    registered domain so link farms and mirrors cannot dominate the
    token budget). Deterministic keep-first-k by doc_id within each
    domain via ONE ranking window, then a per-domain audit rollup:
    total/kept/dropped counts, the boundary id, and the kept character
    budget.

    Scale shape: one shuffle on the domain key for the window + the
    same partitioning reused by the rollup — Catalyst plans a single
    exchange; no join, no Python. Domain skew (one giant domain) is
    the expected case, not a failure: row_number is streaming within
    the partition, never a buffered frame."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
    )
    kept = F.col("rn") <= 100
    # group on the window's own key (source), projecting the domain
    # string AFTER the rollup — grouping on the derived concat would
    # hide the functional dependency from Catalyst and buy a second
    # exchange for nothing
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).alias("n_dropped"),
            F.max(F.when(kept, F.col("doc_id"))).alias("boundary_doc_id"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("domain"),
            "n_docs",
            "n_kept",
            "n_dropped",
            "boundary_doc_id",
            "kept_chars",
        )
    )


@query(
    "llm_boilerplate_detect",
    oracle="""
    WITH p AS (
        SELECT source, substr(text, 1, 16) AS prefix, count(*) AS n
        FROM documents GROUP BY source, substr(text, 1, 16)
    ), tot AS (
        SELECT p.*, sum(n) OVER (PARTITION BY source) AS n_docs,
               max(n) OVER (PARTITION BY source) AS mx
        FROM p
    )
    SELECT source,
           min(prefix)                              AS top_prefix,
           CAST(max(n) AS BIGINT)                   AS n_with_prefix,
           round(max(n) * 1.0 / max(n_docs), 4)     AS prefix_share
    FROM tot WHERE n = mx
    GROUP BY source
    """,
    tags=("llm", "text"),
)
def llm_boilerplate_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection per source: the most common
    16-char document prefix and the share of the source's documents
    carrying it — a high share means a scraped template ("Sign in to
    continue...") that a cleaning pass should strip before training.
    Same two-level deterministic tie-break as agg_mode (max count,
    then smallest prefix); both aggregations run over the bounded
    (source, prefix) relation, never the raw corpus twice."""
    docs = load(spark, sf_dir, "documents")
    p = docs.groupBy("source", F.substring("text", 1, 16).alias("prefix")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("source")
    t = p.withColumn("n_docs", F.sum("n").over(w)).withColumn(
        "mx", F.max("n").over(w)
    ).filter(F.col("n") == F.col("mx"))
    return t.groupBy("source").agg(
        F.min("prefix").alias("top_prefix"),
        F.max("n").alias("n_with_prefix"),
        F.round(F.max("n") * 1.0 / F.max("n_docs"), 4).alias("prefix_share"),
    )


@query(
    "llm_dedup_incremental",
    oracle="""
    WITH fp AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
               doc_id % 5 = 0 AS is_new
        FROM documents
    ), corpus AS (
        SELECT DISTINCT fingerprint FROM fp WHERE NOT is_new
    )
    SELECT f.doc_id, f.source,
           c.fingerprint IS NOT NULL AS dup_of_corpus
    FROM fp f LEFT JOIN corpus c ON f.fingerprint = c.fingerprint
    WHERE f.is_new
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: only the NEW batch (every fifth
    doc here) is checked against the existing corpus's canonical
    fingerprints — the steady-state shape of a production pipeline,
    where re-deduping 100 TB of history per day is not an option and
    the daily batch joins against a fingerprint index instead.
    Plan: the batch is the small side; Catalyst broadcasts it (or the
    fingerprint set, whichever is smaller) and the corpus is touched
    exactly once — at real scale the corpus side is a bucketed
    fingerprint table, making this a shuffle-free probe."""
    docs = load(spark, sf_dir, "documents")
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fp = docs.select(
        "doc_id", "source", F.md5(canon).alias("fingerprint")
    ).withColumn("is_new", F.col("doc_id") % 5 == 0)
    corpus = fp.filter(~F.col("is_new")).select("fingerprint").distinct()
    new = fp.filter(F.col("is_new"))
    return (
        new.join(
            corpus.withColumn("dup_marker", F.lit(1)), "fingerprint", "left"
        )
        .select(
            "doc_id",
            "source",
            F.col("dup_marker").isNotNull().alias("dup_of_corpus"),
        )
    )


@query(
    "llm_dedup_minhash_incremental",
    oracle="""
WITH canon AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS c
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id,
           (ascii(substr(c, i::INT, 1))::BIGINT * 67503107
          + ascii(substr(c, i::INT + 1, 1)) * 16974593
          + ascii(substr(c, i::INT + 2, 1)) * 66049
          + ascii(substr(c, i::INT + 3, 1)) * 257
          + ascii(substr(c, i::INT + 4, 1))) % 2147483647 AS h
    FROM canon, LATERAL unnest(range(1, greatest(length(c) - 3, 2))) t(i)
),
perm AS (
    SELECT i AS pi,
           2 * ((874321::BIGINT * (i + 1)) % 2147483647) + 1 AS a,
           (874321::BIGINT * 7919 * (i + 1)) % 2147483647 AS b
    FROM range(32) t(i)
),
sigv AS (
    SELECT doc_id, pi, min((a * h + b) % 2147483647) AS v
    FROM sh CROSS JOIN perm
    GROUP BY doc_id, pi
),
sig AS (
    SELECT doc_id, list(v ORDER BY pi) AS s
    FROM sigv GROUP BY doc_id
),
batch AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
corp  AS (SELECT * FROM sig WHERE doc_id % 5 <> 0),
exact AS (
    SELECT b.doc_id AS batch_id, min(c.doc_id) AS corpus_id
    FROM batch b JOIN corp c ON b.s = c.s
    GROUP BY b.doc_id
),
cbands AS (
    SELECT doc_id, band, s[band::INT * 4 + 1 : band::INT * 4 + 4] AS blk
    FROM corp CROSS JOIN range(8) t(band)
),
capped AS (
    SELECT band, blk, doc_id AS corpus_id FROM (
        SELECT *, row_number() OVER (PARTITION BY band, blk ORDER BY doc_id) AS rn
        FROM cbands
    ) WHERE rn <= 1000
),
bbands AS (
    SELECT doc_id AS batch_id, band,
           s[band::INT * 4 + 1 : band::INT * 4 + 4] AS blk
    FROM batch CROSS JOIN range(8) t(band)
),
cand AS (
    SELECT DISTINCT b.batch_id, c.corpus_id
    FROM bbands b JOIN capped c ON b.band = c.band AND b.blk = c.blk
    UNION
    SELECT batch_id, corpus_id FROM exact
)
SELECT c.batch_id, c.corpus_id,
       round(list_sum(list_transform(range(1, 33),
             i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END)) / 32.0, 4)
           + 0 AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.batch_id
JOIN sig sb ON sb.doc_id = c.corpus_id
WHERE list_sum(list_transform(range(1, 33),
      i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END)) / 32.0 >= 0.5
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state NEAR-dup ingestion (round 13): the new batch
    (every fifth doc, mirroring llm_dedup_incremental's split) probes
    the banded MinHash index of the existing corpus — history is never
    re-paired against itself, candidates are linear in the batch.
    Exact-signature channel + capped banded probe; see
    llm/dedup.minhash_incremental_pairs for the full scale design.
    Hash-checked: block keys are the band slices themselves and the
    whole pipeline is integer math on the pinned permutation family,
    so the ANSI oracle replays it exactly (same portability argument
    as llm_dedup_sorted_neighborhood)."""
    from ..llm.dedup import minhash_incremental_pairs

    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return minhash_incremental_pairs(corpus, batch, jaccard_threshold=0.5)


def _minhash_index_path(sf_dir: str, params: str) -> str:
    """Cached deployed-index location per (fixture, params, mtime) —
    the same cache discipline as the ivfpq lifecycle keys."""
    import hashlib
    import os

    from .scans import CACHE_DIR

    src = os.path.join(sf_dir, "documents.parquet")
    stamp = str(os.path.getmtime(src)) if os.path.exists(src) else "0"
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{params}|{stamp}".encode()
    ).hexdigest()[:16]
    return os.path.join(CACHE_DIR, "minhash_index", key)


@query(
    "llm_dedup_index_probe",
    oracle="""
WITH canon AS (
    SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS c
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id,
           (ascii(substr(c, i::INT, 1))::BIGINT * 67503107
          + ascii(substr(c, i::INT + 1, 1)) * 16974593
          + ascii(substr(c, i::INT + 2, 1)) * 66049
          + ascii(substr(c, i::INT + 3, 1)) * 257
          + ascii(substr(c, i::INT + 4, 1))) % 2147483647 AS h
    FROM canon, LATERAL unnest(range(1, greatest(length(c) - 3, 2))) t(i)
),
perm AS (
    SELECT i AS pi,
           2 * ((874321::BIGINT * (i + 1)) % 2147483647) + 1 AS a,
           (874321::BIGINT * 7919 * (i + 1)) % 2147483647 AS b
    FROM range(32) t(i)
),
sigv AS (
    SELECT doc_id, pi, min((a * h + b) % 2147483647) AS v
    FROM sh CROSS JOIN perm
    GROUP BY doc_id, pi
),
sig AS (
    SELECT doc_id, list(v ORDER BY pi) AS s
    FROM sigv GROUP BY doc_id
),
batch AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
corp  AS (SELECT * FROM sig WHERE doc_id % 5 <> 0),
exact AS (
    SELECT b.doc_id AS batch_id, min(c.doc_id) AS corpus_id
    FROM batch b JOIN corp c ON b.s = c.s
    GROUP BY b.doc_id
),
cbands AS (
    SELECT doc_id, band, s[band::INT * 4 + 1 : band::INT * 4 + 4] AS blk
    FROM corp CROSS JOIN range(8) t(band)
),
capped AS (
    SELECT band, blk, doc_id AS corpus_id FROM (
        SELECT *, row_number() OVER (PARTITION BY band, blk ORDER BY doc_id) AS rn
        FROM cbands
    ) WHERE rn <= 1000
),
bbands AS (
    SELECT doc_id AS batch_id, band,
           s[band::INT * 4 + 1 : band::INT * 4 + 4] AS blk
    FROM batch CROSS JOIN range(8) t(band)
),
cand AS (
    SELECT DISTINCT b.batch_id, c.corpus_id
    FROM bbands b JOIN capped c ON b.band = c.band AND b.blk = c.blk
    UNION
    SELECT batch_id, corpus_id FROM exact
)
SELECT c.batch_id, c.corpus_id,
       round(list_sum(list_transform(range(1, 33),
             i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END)) / 32.0, 4)
           + 0 AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.batch_id
JOIN sig sb ON sb.doc_id = c.corpus_id
WHERE list_sum(list_transform(range(1, 33),
      i -> CASE WHEN sa.s[i] = sb.s[i] THEN 1 ELSE 0 END)) / 32.0 >= 0.5
    """,
    tags=("llm", "dedup"),
)
def llm_dedup_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deployed dedup index: build-once / probe-many (round 13 — the
    dedup twin of llm_knn_ivfpq_probe). ``build_minhash_index``
    persists signatures + capped banded blocks once per fixture; this
    key then pays ONLY the probe: batch signatures, the exact-match
    join against the stored signature relation, the banded join
    against the stored (band, bucket) relation, verify. The cap
    discipline matches the ad-hoc probe exactly, so the output is
    byte-identical to llm_dedup_minhash_incremental over the same
    %5 split and the key shares its exact ANSI oracle (equality also
    unit-tested)."""
    import os

    from ..llm.dedup import build_minhash_index, minhash_index_probe

    docs = load(spark, sf_dir, "documents")
    index_path = _minhash_index_path(sf_dir, "mh32_b8_k5_cap1000")
    if not os.path.exists(os.path.join(index_path, "bands", "_SUCCESS")):
        build_minhash_index(docs.filter(F.col("doc_id") % 5 != 0), index_path)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_index_probe(spark, index_path, batch, jaccard_threshold=0.5)


@query("llm_dedup_index_refresh", oracle=None, tags=("llm", "dedup", "approx"))
def llm_dedup_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deployed dedup index MAINTENANCE: fold newly ingested documents
    into the index as accumulating delta relations without rewriting
    it (``minhash_index_refresh``; idempotent anti-join on id, so
    every bench run converges to the same index state), then probe a
    later batch — matches must now surface against BOTH the original
    corpus and the refreshed slice, proving ingested documents are
    immediately matchable. Base = doc_id %5 in {2,3,4}; refreshed
    slice = %5 == 1; probe batch = %5 == 0. Rows-only like the ivfpq
    maintenance keys (the delta/base split is an index-state detail
    recursive SQL has no business replaying); delta visibility +
    compact identity are unit-tested."""
    import os

    from ..llm.dedup import (
        build_minhash_index,
        minhash_index_probe,
        minhash_index_refresh,
    )

    docs = load(spark, sf_dir, "documents")
    index_path = _minhash_index_path(sf_dir, "refresh_mh32_b8_k5_cap1000")
    if not os.path.exists(os.path.join(index_path, "bands", "_SUCCESS")):
        build_minhash_index(
            docs.filter(~(F.col("doc_id") % 5).isin(0, 1)), index_path
        )
    minhash_index_refresh(spark, index_path, docs.filter(F.col("doc_id") % 5 == 1))
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_index_probe(spark, index_path, batch, jaccard_threshold=0.5)


# --------------------------------------------------------------------------
# Retrieval scoring / tokenizer-training primitives (round 12)
# --------------------------------------------------------------------------


@query(
    "llm_bm25_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), tf AS (
        SELECT doc_id, token AS term, count(*) AS tf
        FROM toks WHERE token IN ('spark', 'join', 'window', 'hash')
        GROUP BY doc_id, token
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
           ), 4) + 0 AS bm25
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 20
    """,
    tags=("llm", "text"),
)
def llm_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson k1=1.2, b=0.75) of every
    document against a fixed query-term set — the lexical-retrieval
    primitive a training pipeline uses for quality-targeted sampling
    and eval-set mining.

    Scale shape: ONE corpus exchange total. The exploded token stream
    aggregates once per doc_id carrying dl AND the per-query-term
    conditional tf counts in the same aggregate (the term list is a
    fixed literal, so tf-per-term is a handful of map-side-combinable
    conditional sums, never a (doc, term) shuffle over the whole
    vocabulary). The per-(doc, term) relation is then unpivoted from
    that per-doc frame; df (<= |terms| rows) and the (N, avgdl) scalar
    broadcast back. Everything downstream of the one aggregate is
    broadcast-joined, and the top-20 is TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    terms = ["spark", "join", "window", "hash"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    stack_args = ", ".join(f"'{t}', tf_{i}" for i, t in enumerate(terms))
    tfl = per_doc.selectExpr(
        "doc_id", "dl", f"stack({len(terms)}, {stack_args}) AS (term, tf)"
    ).filter(F.col("tf") > 0)
    df_ = tfl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    return (
        # bounded: df_ has <= |terms| (4) rows; stats is a 1-row aggregate
        tfl.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            (
                F.round(
                    F.sum(
                        idf
                        * F.col("tf")
                        * 2.2
                        / (
                            F.col("tf")
                            + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                        )
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@query(
    "llm_bpe_pair_merge",
    oracle="""
    WITH vocab AS (
        SELECT token, count(*) AS freq
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        WHERE token <> '' GROUP BY token
    ), pairs AS (
        SELECT substr(token, CAST(i AS INT), 2) AS pair, freq
        FROM vocab, unnest(range(1, len(token))) AS t(i)
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """,
    tags=("llm", "text"),
)
def llm_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first byte-pair-encoding merge step: corpus-weighted
    adjacent-symbol pair frequencies over the word vocabulary, top
    candidates first — the inner loop of tokenizer training, run at
    corpus scale.

    Scale shape: the corpus collapses to its VOCABULARY before any
    per-character work (one token exchange with map-side partials;
    vocabulary growth is Heaps-law sublinear), then pair enumeration
    is transform(sequence(...)) over vocab-sized input — JVM
    whole-stage codegen, no Python — and the pair aggregate's key
    space is bounded by the alphabet squared, so the final exchange
    is KBs at any corpus size. An iterated BPE trainer would loop
    this key's plan with the learned merge applied; one step is the
    registered, oracle-checked unit."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.filter(F.length("token") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@query(
    "llm_bpe_apply_merge",
    oracle="""
    WITH vocab AS (
        SELECT token, count(*) AS freq
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        WHERE token <> '' GROUP BY token
    ), pc AS (
        SELECT substr(token, CAST(i AS INT), 2) AS pair, sum(freq) AS n
        FROM vocab, unnest(range(1, len(token))) AS t(i)
        GROUP BY pair
    ), top1 AS (
        SELECT pair FROM pc ORDER BY n DESC, pair LIMIT 1
    )
    SELECT top1.pair AS merged_pair,
           CAST(sum(freq * (len(token) - len(replace(token, top1.pair, 'X'))))
                AS BIGINT) AS n_merges,
           CAST(sum(freq * len(token)) AS BIGINT) AS symbols_before,
           CAST(sum(freq * len(replace(token, top1.pair, 'X'))) AS BIGINT)
               AS symbols_after
    FROM vocab CROSS JOIN top1
    GROUP BY top1.pair
    """,
    tags=("llm", "text"),
)
def llm_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of a BPE training step: APPLY the winning merge
    from llm_bpe_pair_merge back to the vocabulary and report the
    corpus compression it buys (merge count, symbols before/after) —
    the accept/measure loop of tokenizer training.

    A single character-level merge is exactly non-overlapping
    left-to-right pair replacement, so the application is JVM
    replace()/length() algebra — no Python, no per-symbol explode.
    Scale shape: same Heaps-law vocabulary aggregate as the pair-count
    key, the winning pair stays in-plan as a 1-row broadcast (never a
    driver collect), and the report is a global aggregate over
    vocab-sized input. An iterated trainer would loop exactly this
    plan with the merged symbol re-entering the alphabet; the
    full-corpus tokenization applies the learned table to DISTINCT
    words once and broadcast-joins the result back to the corpus."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top1 = (
        vocab.filter(F.length("token") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(token) - 1),"
                    " i -> substring(token, i, 2))"
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(1)
        .select("pair")
    )
    after_len = F.length(F.replace(F.col("token"), F.col("pair"), F.lit("X")))
    return (
        # bounded: top1 is LIMIT 1
        vocab.crossJoin(F.broadcast(top1))
        .groupBy(F.col("pair").alias("merged_pair"))
        .agg(
            F.sum(F.col("freq") * (F.length("token") - after_len))
            .cast("long")
            .alias("n_merges"),
            F.sum(F.col("freq") * F.length("token"))
            .cast("long")
            .alias("symbols_before"),
            F.sum(F.col("freq") * after_len).cast("long").alias("symbols_after"),
        )
    )


@query(
    "llm_bpe_train",
    oracle=None,
    tags=("llm", "text", "iterative", "custom-operator"),
)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full byte-pair-encoding training loop: 6 greedy merge rounds
    over the corpus vocabulary, returning the learned merge table
    (step, pair, merged, weighted count) — the artifact a tokenizer
    ships. Rows-only by design, exactly like graph_kcore: each round's
    winner is an aggregate over the PREVIOUS round's merged state,
    which recursive SQL cannot express (GROUP BY inside the
    recursion); correctness is property-tested against a sequential
    reference BPE (tests/test_llm.py::test_bpe_train_matches_sequential_reference).

    Scale shape: the corpus is exchanged ONCE (the initial token
    aggregate); every round after that is vocabulary-sized — pair
    counts via zip_with over the symbol arrays, the winner via a
    1-row parameter-only collect (the same bounded pattern as the
    kNN query vectors), and the merge applied as a JVM
    F.aggregate left fold (greedy leftmost non-overlapping, the BPE
    contract). Lineage is cut per round with a lazy localCheckpoint
    (the winner collect materializes it), so round k never replays
    rounds 1..k-1 — the labelprop/kcore loop discipline."""
    from ..ckpt import CHECKPOINT_LEVEL

    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.expr(
                "transform(sequence(1, length(token)), i -> substring(token, i, 1))"
            ).alias("symbols"),
            "freq",
        )
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    merges = []
    for step in range(1, 7):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.expr("slice(symbols, 1, size(symbols) - 1)"),
                    F.expr("slice(symbols, 2, size(symbols) - 1)"),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()  # parameter-only: exactly one row per round
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merged = a + b
        merges.append((step, a, b, merged, int(n)))
        la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)
        vocab = vocab.select(
            F.aggregate(
                "symbols",
                F.expr("CAST(array() AS array<string>)"),
                # greedy leftmost fold: merge x into the accumulator's
                # tail iff (tail, x) == the winning pair
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (x == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(lm)
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("symbols"),
            "freq",
        ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    return spark.createDataFrame(
        merges, "step int, pair_a string, pair_b string, merged string, n long"
    ).orderBy("step")


@query(
    "llm_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars AS w,
               ((((doc_id % 2147483648) * 2654435761 + 1013904223)
                   % 4294967296) + 0.5) / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, w, round(ln(u) / w, 9) + 0 AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT 20
    """,
    tags=("llm", "sampling"),
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006): each item draws key = u^(1/w) and
    the sample is the top-k by key — the one-pass distributed answer
    to "sample 20 documents proportional to quality weight, no
    repeats" that sequential reservoir algorithms can't give a
    cluster. Weight here is n_chars (a stand-in for any quality
    score).

    Round-13 advice fixes: (a) the key lives in the LOG domain —
    ln(u)/w, order-equivalent to u^(1/w) since x -> e^x is monotone —
    because the direct key saturates toward 1.0 for large weights and
    a 6-decimal rounding then degenerated top-k into the doc_id
    tie-break; ln(u)/w stays separated at any realistic weight scale
    (9-decimal rounding resolves distinct keys up to w ~ 1e6 — the
    granularity exists only to absorb sub-ulp libm differences between
    the JVM and DuckDB). (b) doc_id reduces mod 2^31 BEFORE the LCG
    multiply, so the product peaks at 5.7e18 < 2^63-1 on both engines —
    previously doc_id > ~3.47e9 silently wrapped in Spark while DuckDB
    raised. (c) u gets a +0.5/2^32 half-step so it is strictly inside
    (0,1): ln(0) is NULL in Spark but an error in DuckDB.

    Scale shape: keys are a pure projection, the top-k is
    TakeOrderedAndProject — NO shuffle at any corpus size; a
    per-stratum variant composes with the stratified-sample key's
    window. The uniform draw is a deterministic Knuth/LCG modular hash
    of doc_id (the countmin/bloom engine-portable-hashing trick), so
    the DuckDB oracle reproduces the draw exactly and the sample is
    hash-checkable; production swaps in a salted hash per epoch —
    same plan, different constant."""
    keyed = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").alias("w"),
            (
                (
                    (
                        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
                         + F.lit(1013904223))
                        % F.lit(4294967296)
                    ).cast("double")
                    + F.lit(0.5)
                )
                / F.lit(4294967296.0)
            ).alias("u"),
        )
    )
    return (
        keyed.select(
            "doc_id",
            "w",
            (F.round(F.log("u") / F.col("w"), 9) + F.lit(0.0)).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(20)
    )
