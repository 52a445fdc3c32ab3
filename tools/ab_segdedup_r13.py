"""Interleaved A/B: llm_segment_dedup one-exchange window re-plan (new,
optimization round 13) vs the prior df-aggregate + join-back shape
(segmentation evaluated twice, 3 corpus exchanges). BASELINE.md
protocol: same session, alternating runs, medians AND mins.

    python tools/ab_segdedup_r13.py --runs 5 --out AB_SEGDEDUP_r13opt.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.queries.scans import load
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_segment_dedup(spark, sf_dir):
    """Pre-r13opt shape: count_distinct aggregate joined back onto a
    second evaluation of the exploded segmentation."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    nseg = F.ceil(F.size(words) / F.lit(3.0)).cast("int")
    segments = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(words, i * 3 + 1, 3), " "),
    )
    seg = docs.select("doc_id", F.explode(segments).alias("seg_text"))
    freq = seg.groupBy("seg_text").agg(F.count_distinct("doc_id").alias("ndocs"))
    return (
        seg.join(freq, "seg_text")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_segs"),
            F.sum(F.when(F.col("ndocs") <= 2, 1).otherwise(0)).alias("kept_segs"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = "AB_SEGDEDUP_r13opt.json"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    spark = get_spark(
        "ab-segdedup",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()
    REGISTRY["udf_pandas"].fn(spark, SF_DIR).count()

    variants = {
        "old": lambda: old_segment_dedup(spark, SF_DIR).count(),
        "new": lambda: REGISTRY["llm_segment_dedup"].fn(spark, SF_DIR).count(),
    }
    res: dict[str, list[float]] = {"old": [], "new": []}
    for name, fn in variants.items():
        fn()
        release_checkpoints(spark)
    for _ in range(runs):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            res[name].append(round(time.perf_counter() - t0, 4))
            release_checkpoints(spark)

    summary = {
        "llm_segment_dedup": {
            "old_median": round(statistics.median(res["old"]), 3),
            "new_median": round(statistics.median(res["new"]), 3),
            "old_min": round(min(res["old"]), 3),
            "new_min": round(min(res["new"]), 3),
            "runs_old": res["old"],
            "runs_new": res["new"],
        }
    }
    s = summary["llm_segment_dedup"]
    print(
        f"llm_segment_dedup: old med {s['old_median']} min {s['old_min']}"
        f" -> new med {s['new_median']} min {s['new_min']}"
    )
    with open(out, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "runs": runs, "results": summary}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
