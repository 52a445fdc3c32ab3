"""Dedup/similarity scaling spot-check over the documents/embeddings
tables (the BASELINE.md "10x spot-check" formalized as a tool).

Replicates sf0.1 documents and embeddings K times with id offsets and
per-copy perturbation chosen to be ADVERSARIAL for dedup: every copied
document gains one appended token (so each original gains K-1 true
near-duplicates — duplicate density grows with scale, the worst case
for LSH pair generation), and every copied embedding is nudged by a
small per-copy epsilon (so cosine near-dup pairs multiply too). A
pipeline that is linear on this input is linear on a benign corpus.

    python tools/scalecheck_docs.py                      # -> SCALECHECK_DOCS_local.json
    python tools/scalecheck_docs.py --out SCALECHECK_DOCS_r06.json

Reading the ratios (tiers 1x -> 10x): row count AND duplicate density
both grow 10x, so a linear pipeline shows wall-clock ratio <= ~10 plus
the per-stage floor; meaningfully above ~10 means a pair blow-up or a
plan that fell off its intended strategy. Output row counts are
recorded alongside timings because for pair-emitting keys the TRUE
output itself grows super-linearly (each original's duplicate clique
grows quadratically) — wall-clock must be judged against that.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

BASE_SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
KEYS = (
    "llm_dedup_exact",       # hash groupBy — the linear floor reference
    "llm_dedup_minhash",     # banded LSH pair generation
    "llm_dedup_survivors",   # pairs -> components -> anti-join, full pipeline
    "llm_dedup_semantic",    # SemDeDup cluster-scoped quadratic
    "llm_dedup_embedding",   # hyperplane-LSH cosine near-dup pairs
    "llm_sim_join",          # LSH prefilter + exact-verify threshold join
)
TIERS = (1, 10)
# the pair-emitting pipelines whose banded-bucket sizes are the scaling
# risk (sum of bucket^2 inside bands) get a third, 100x tier: every
# original gains 99 true near-duplicates, so TRUE pair output grows
# ~x100^2 inside cliques while the corpus grows x100 — the adversarial
# regime where a super-linear-in-corpus implementation would bend.
# llm_dedup_embedding joined the deep tier in round 11: its output-cap
# contract (max_bucket_vecs anchor stars, truncation logged) makes the
# geometry-bound regime completable — the tier now measures the capped
# operator the way production would run it. The CONTROLLED tiers still
# exclude it (see controlled_note: no linear-pair fixture exists at
# threshold 0.30 / d=64).
DEEP_KEYS = (
    "llm_dedup_minhash",
    "llm_dedup_survivors",
    "llm_sim_join",
    "llm_dedup_embedding",
)
DEEP_TIER = 100


def build_tier(spark, factor: int) -> str:
    out_dir = f"/tmp/scalecheck_docs/x{factor}"
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_dir
    from pyspark.sql import functions as F

    # one explode per source row instead of a factor-way union — the
    # 100x tier would otherwise build a 100-branch plan
    copy_idx = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")

    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    df = docs.select("*", copy_idx).select(
        (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
        # copy 0 is verbatim; copies i>0 append one token so each
        # original gains factor-1 true near-duplicates (high Jaccard,
        # non-identical bytes) — adversarial density.
        F.when(F.col("__copy") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" variant"), F.col("__copy").cast("string")))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    ef = emb.select("*", copy_idx).select(
        (F.col("vec_id") + F.col("__copy") * 10_000_000).alias("vec_id"),
        # tiny per-copy nudge: cosine(original, copy) ~ 1, so every
        # original gains factor-1 semantic near-duplicates.
        F.transform(
            "embedding",
            lambda x: (x + F.col("__copy") * F.lit(0.001)).cast("float"),
        ).alias("embedding"),
        "label",
    )
    ef.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    open(marker, "w").close()
    return out_dir


# ---------------------------------------------------------------------------
# CONTROLLED-density tiers (round-9 verdict item 5): the adversarial
# fixture above makes TRUE pair counts quadratic by construction (every
# original's copies form one growing clique), so its 100x tier measures
# pair materialization, not corpus scaling. The controlled fixture caps
# each original's near-dup clique at NEAR_COPIES regardless of tier:
# copies 1..NEAR_COPIES stay above the near-dup thresholds (one
# appended token / eps embedding nudge), copies beyond are perturbed
# FAR below them (documents: the text is replaced with pseudo-random
# tokens from a 100k vocabulary, Jaccard ~ 0 to everything; embeddings:
# per-(vec,copy,position) sign flips, cosine ~ N(0, 1/sqrt(64)) to
# everything — far below sim_join's 0.95 verify). TRUE pair counts are
# then ~flat across tiers while the corpus grows 10x -> 100x, so a
# corpus-linear pipeline must show wall-clock ratio <= ~10.
#
# llm_dedup_embedding (threshold 0.30) is EXCLUDED with a geometric
# reason, not skipped silently: in d=64 a random/sign-flipped pair has
# cos ~ N(0, ~1/8), so P(cos > 0.30) ~ 1e-2 and a 200k-vector corpus
# carries ~1e8 TRUE above-threshold pairs no matter how copies are
# perturbed — at this (threshold, dimension) a large corpus with linear
# pair counts does not exist, and the 10x adversarial tier above
# remains that key's scaling evidence.
NEAR_COPIES = 5
CONTROLLED_KEYS = ("llm_dedup_minhash", "llm_dedup_survivors", "llm_sim_join")
CONTROLLED_TIERS = (10, 100)


def build_controlled_tier(spark, factor: int) -> str:
    out_dir = f"/tmp/scalecheck_docs/ctl_x{factor}"
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_dir
    from pyspark.sql import functions as F

    copy_idx = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    near = F.col("__copy") <= NEAR_COPIES  # copy 0 = verbatim original

    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    far_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda j: F.concat(
                F.lit("w"),
                (
                    F.pmod(F.xxhash64(F.col("doc_id"), F.col("__copy"), j), F.lit(100_000))
                ).cast("string"),
            ),
        ),
    )
    df = docs.select("*", copy_idx).select(
        (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
        F.when(F.col("__copy") == 0, F.col("text"))
        .when(near, F.concat(F.col("text"), F.lit(" variant"), F.col("__copy").cast("string")))
        .otherwise(far_text)
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    flip = lambda x, i: F.when(  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), F.col("__copy"), i), F.lit(2)) == 0, x
    ).otherwise(-x)
    ef = emb.select("*", copy_idx).select(
        (F.col("vec_id") + F.col("__copy") * 10_000_000).alias("vec_id"),
        F.when(
            near,
            F.transform(
                "embedding", lambda x: (x + F.col("__copy") * F.lit(0.001)).cast("float")
            ),
        )
        .otherwise(F.transform("embedding", lambda x, i: flip(x, i).cast("float")))
        .alias("embedding"),
        "label",
    )
    ef.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    open(marker, "w").close()
    return out_dir


def run_controlled(spark) -> dict:
    from appstore_aws_etl_spark.ckpt import release_checkpoints

    tiers = {f: build_controlled_tier(spark, f) for f in CONTROLLED_TIERS}
    out: dict[str, dict] = {}
    for key in CONTROLLED_KEYS:
        fn = REGISTRY[key].fn
        rec: dict = {}
        for f in CONTROLLED_TIERS:
            d = tiers[f]
            out_rows = fn(spark, d).count()  # warm
            release_checkpoints(spark)
            t0 = time.time()
            fn(spark, d).count()
            rec[f"t{f}x"] = round(time.time() - t0, 2)
            rec[f"out_rows_{f}x"] = out_rows
            release_checkpoints(spark)
            print(f"[controlled] {key} x{f}: {rec[f't{f}x']} s, {out_rows} rows", flush=True)
        rec["walltime_ratio_100x_vs_10x"] = round(rec["t100x"] / max(rec["t10x"], 1e-9), 1)
        rec["out_growth_100x_vs_10x"] = round(
            rec["out_rows_100x"] / max(rec["out_rows_10x"], 1), 2
        )
        out[key] = rec
    return out


def main() -> int:
    out_path = "SCALECHECK_DOCS_local.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark("scalecheck-docs")
    # --no-deep: skip the 100x duplicate-density tier. That tier is
    # OUTPUT-bound by construction (every base doc becomes a 100-clique,
    # so true pair output grows ~100x vs the 10x tier) — it measures
    # pair materialization walltime, not plan shape, and runs for tens
    # of minutes; the 10x tier is the density-controlled scaling signal.
    deep = "--no-deep" not in args
    controlled = "--controlled" in args
    all_tiers = TIERS + ((DEEP_TIER,) if deep else ())
    tiers = {f: build_tier(spark, f) for f in all_tiers}
    rows = {
        f: spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        for f, d in tiers.items()
    }
    results: dict[str, dict] = {}
    for key in KEYS:
        fn = REGISTRY[key].fn
        rec: dict = {}
        key_tiers = TIERS + ((DEEP_TIER,) if deep and key in DEEP_KEYS else ())
        for f in key_tiers:
            d = tiers[f]
            out_rows = fn(spark, d).count()  # warm: codegen + listing
            # the deep tier runs once after its warm run (minutes-long
            # keys; a best-of-2 would double a walltime already far
            # above noise), smaller tiers keep warm + best-of-2
            n_timed = 1 if f == DEEP_TIER else 2
            best = None
            for _ in range(n_timed):
                t0 = time.time()
                fn(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rec[f"t{f}x"] = round(best, 2)
            rec[f"out_rows_{f}x"] = out_rows
            print(f"{key} x{f}: {rec[f't{f}x']} s, {out_rows} rows", flush=True)
        rec["ratio_10x"] = round(rec["t10x"] / max(rec["t1x"], 1e-9), 1)
        if f"t{DEEP_TIER}x" in rec:
            rec[f"ratio_{DEEP_TIER}x_vs_10x"] = round(
                rec[f"t{DEEP_TIER}x"] / max(rec["t10x"], 1e-9), 1
            )
            rec[f"out_growth_{DEEP_TIER}x_vs_10x"] = round(
                rec[f"out_rows_{DEEP_TIER}x"] / max(rec["out_rows_10x"], 1), 1
            )
        results[key] = rec
    import datetime

    controlled_results = run_controlled(spark) if controlled else None

    artifact = {
        "date": datetime.date.today().isoformat(),
        "rows": rows,
        "note": (
            "documents/embeddings replicated with id offsets; text copies "
            "append one token and embedding copies are eps-nudged, so "
            "duplicate density grows with the tier (adversarial for LSH "
            "pair generation). warm then best-of-2 (deep 100x tier: warm "
            "then one timed run). linear = ratio_10x <= ~10 + floor; "
            "judge pair-emitting keys against out_rows growth — at 100x "
            "every original has 99 true near-dups so TRUE pair output "
            "grows ~quadratically inside cliques while the corpus grows "
            "100x; a pipeline is corpus-linear iff wall-clock tracks "
            "out_rows, not corpus^2."
        ),
        "results": results,
    }
    if controlled_results is not None:
        artifact["controlled_note"] = (
            "density-CONTROLLED tiers (10x, 100x): each original keeps "
            f"exactly {NEAR_COPIES} near-dup copies at EVERY tier; further "
            "copies are perturbed far below the thresholds (documents: "
            "pseudo-random 30-token texts, Jaccard ~0; embeddings: "
            "per-position sign flips, cosine ~N(0, 1/8) — far under "
            "sim_join's 0.95 verify). TRUE pair counts are therefore ~flat "
            "10x -> 100x while the corpus grows 10x, so corpus-linear = "
            "walltime_ratio_100x_vs_10x <= ~10 with out_growth ~1. "
            "llm_dedup_embedding (threshold 0.30) is excluded by geometry, "
            "not omission: in d=64, P(cos>0.30) ~ 1e-2 for ANY mutually "
            "unstructured population, so a 200k-vector corpus carries "
            "~1e8 true above-threshold pairs regardless of perturbation — "
            "no linear-pair 100x fixture exists at that (threshold, dim); "
            "its scaling evidence stays the adversarial 10x tier above."
        )
        artifact["controlled_results"] = controlled_results
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(results, indent=1))
    if controlled_results is not None:
        print(json.dumps(controlled_results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
