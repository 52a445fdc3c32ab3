"""Interleaved A/B of graph_kcore's edge-relation checkpoint storage
level at DRIVER bench config (r8 verdict watch item 2: BENCH_r08 showed
kcore 2.74 -> 3.62 s (+32%), the only un-adjudicated >30% mover; the
likely cause is the repo-wide serialized checkpoint level (ckpt.py),
whose A/B covered pagerank and survivors but not kcore).

Variant A = current code: nxt checkpointed at CHECKPOINT_LEVEL
            (MEMORY_AND_DISK serialized; the keep-side node set already
            uses the default deserialized level — the policy is split).
Variant B = nxt checkpointed at the default deserialized level (the
            pre-r8 behavior for the edge relation).

Protocol mirrors bench.py exactly: local[$SPARK_GRAFT_CPUS], shuffle=2,
AQE off, count() action, one untimed warm run per variant, then N timed
runs interleaved A,B,A,B,... (so box drift hits both equally); reports
per-run times and medians as one JSON line plus a dated artifact file
(REMEASURE-style). Checkpoint blocks are released between runs so each
timing starts from empty executor storage.

Run: python tools/ab_kcore.py [n_runs]
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from appstore_aws_etl_spark.ckpt import CHECKPOINT_LEVEL, release_checkpoints
from appstore_aws_etl_spark.queries.graph import _weighted_copurchase_edges
from appstore_aws_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def kcore_once(spark, serialized: bool) -> int:
    """Inline copy of operators/kcore.py's peel loop with the edge
    checkpoint level as the ONLY variable (keep-side stays default in
    both variants, matching the shipped split policy)."""
    edges = _weighted_copurchase_edges(spark, SF_DIR, min_support=2)
    alive = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).select("src", "dst")
    level_kwargs = {"storageLevel": CHECKPOINT_LEVEL} if serialized else {}
    prev_edges = None
    for _ in range(64):
        deg = alive.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= 3).select("src").localCheckpoint(
            eager=False
        )
        nxt = (
            alive.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=False, **level_kwargs)
        )
        n_edges = nxt.count()
        alive = nxt
        if n_edges == 0 or n_edges == prev_edges:
            return alive.groupBy(F.col("src").alias("node")).agg(
                F.count(F.lit(1)).alias("degree")
            ).count()
        prev_edges = n_edges
    raise RuntimeError("did not converge")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "ab_kcore",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    results = {"A_serialized": [], "B_deserialized": []}
    rows = {}
    # warm both variants (codegen + scan cache paths)
    for key, serialized in (("A_serialized", True), ("B_deserialized", False)):
        rows[key] = kcore_once(spark, serialized)
        release_checkpoints(spark)
    assert rows["A_serialized"] == rows["B_deserialized"], rows
    for _ in range(n_runs):
        for key, serialized in (("A_serialized", True), ("B_deserialized", False)):
            t0 = time.perf_counter()
            kcore_once(spark, serialized)
            results[key].append(round(time.perf_counter() - t0, 3))
            release_checkpoints(spark)
    out = {
        "date": datetime.date.today().isoformat(),
        "sf_dir": SF_DIR,
        "protocol": "bench.py driver config (shuffle=2, AQE off), "
        "interleaved A,B per round, checkpoints released between runs",
        "result_rows": rows["A_serialized"],
        "runs": results,
        "median": {k: statistics.median(v) for k, v in results.items()},
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
