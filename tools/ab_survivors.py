"""Interleaved A/B of llm_dedup_survivors label seeding at DRIVER bench
config (r7 verdict item 2: driver bench showed 3.98 s (r6, identity
seed) -> 5.48 s (r7, grouped-min seed) in the round whose commit
7af03b9 claimed the seed was a 0.3-0.7 s improvement).

Variant A = r7 grouped-min neighbour seed (current code).
Variant B = r6 identity seed (labels = distinct nodes, component=node).

Protocol mirrors bench.py exactly: local[$SPARK_GRAFT_CPUS], shuffle=2,
AQE off, count() action, one untimed warm run per variant, then N timed
runs interleaved A,B,A,B,... (so box drift hits both equally); report
per-run times and medians as one JSON line plus a dated artifact file.

Run: python tools/ab_survivors.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels
from appstore_aws_etl_spark.queries.llm import minhash_near_dup_pairs
from appstore_aws_etl_spark.queries.scans import load
from appstore_aws_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def survivors(spark, seed: str):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    offset = docs.agg(F.max("doc_id")).first()[0] + 1
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + F.lit(offset)).alias("doc_id"), "text"
        )
    )
    pairs = minhash_near_dup_pairs(aug, jaccard_threshold=0.5).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    und = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    if seed == "grouped_min":
        labels = und.groupBy(F.col("src").alias("node")).agg(
            F.least(F.min("dst"), F.min("src")).alias("component")
        )
    else:  # identity (r6)
        labels = und.select(F.col("src").alias("node")).distinct().withColumn(
            "component", F.col("node")
        )
    labels = propagate_min_labels(und, labels, "node", "component", max_rounds=50)
    losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return (
        aug.join(F.broadcast(losers), "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "ab_survivors",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    variants = ["grouped_min", "identity"]
    counts = {}
    for v in variants:  # untimed warm run (codegen + Arrow pool)
        counts[v] = survivors(spark, v).count()
    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(n):
        for v in variants:
            t0 = time.perf_counter()
            survivors(spark, v).count()
            times[v].append(round(time.perf_counter() - t0, 3))
    med = {
        v: sorted(ts)[len(ts) // 2] for v, ts in times.items()
    }
    out = {
        "config": {
            "sf_dir": SF_DIR,
            "shuffle": spark.conf.get("spark.sql.shuffle.partitions"),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            "runs": n,
            "protocol": "interleaved warm-then-time, count() action",
        },
        "rows": counts,
        "times": times,
        "median": med,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
