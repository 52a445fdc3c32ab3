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


def build_tier(spark, factor: int) -> str:
    out_dir = f"/tmp/scalecheck_docs/x{factor}"
    marker = os.path.join(out_dir, "_done")
    if os.path.exists(marker):
        return out_dir
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(BASE_SF_DIR, "documents.parquet"))
    doc_copies = []
    for i in range(factor):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # copy 0 is verbatim; copies i>0 append one token so each
            # original gains factor-1 true near-duplicates (high
            # Jaccard, non-identical bytes) — adversarial density.
            (
                F.col("text")
                if i == 0
                else F.concat(F.col("text"), F.lit(f" variant{i}"))
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        doc_copies.append(c)
    df = doc_copies[0]
    for c in doc_copies[1:]:
        df = df.unionAll(c)
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE_SF_DIR, "embeddings.parquet"))
    emb_copies = []
    for i in range(factor):
        eps = 0.001 * i
        c = emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            # tiny per-copy nudge: cosine(original, copy) ~ 1, so every
            # original gains factor-1 semantic near-duplicates.
            F.transform(
                "embedding", lambda x: (x + F.lit(eps)).cast("float")
            ).alias("embedding"),
            "label",
        )
        emb_copies.append(c)
    ef = emb_copies[0]
    for c in emb_copies[1:]:
        ef = ef.unionAll(c)
    ef.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    open(marker, "w").close()
    return out_dir


def main() -> int:
    out_path = "SCALECHECK_DOCS_local.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark("scalecheck-docs")
    tiers = {f: build_tier(spark, f) for f in TIERS}
    rows = {
        f: spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        for f, d in tiers.items()
    }
    results: dict[str, dict] = {}
    for key in KEYS:
        fn = REGISTRY[key].fn
        rec: dict = {}
        for f, d in tiers.items():
            out_rows = fn(spark, d).count()  # warm: codegen + listing
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rec[f"t{f}x"] = round(best, 2)
            rec[f"out_rows_{f}x"] = out_rows
            print(f"{key} x{f}: {rec[f't{f}x']} s, {out_rows} rows", flush=True)
        rec["ratio_10x"] = round(rec["t10x"] / max(rec["t1x"], 1e-9), 1)
        results[key] = rec
    import datetime

    artifact = {
        "date": datetime.date.today().isoformat(),
        "rows": rows,
        "note": (
            "documents/embeddings replicated with id offsets; text copies "
            "append one token and embedding copies are eps-nudged, so "
            "duplicate density grows with the tier (adversarial for LSH "
            "pair generation). warm then best-of-2. linear = ratio_10x <= "
            "~10 + floor; judge pair-emitting keys against out_rows growth."
        ),
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
