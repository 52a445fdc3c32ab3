"""q21 one-exchange re-plan A/B at 100x (round-10 verdict item 4's
"can the exists/not-exists legs share one exchange" question).

Current registered shape: the decorrelated EXISTS/NOT-EXISTS pair
costs a SECOND full-width lineitem exchange (order_supps'
count_distinct partial-aggregates ~every (orderkey, suppkey) pair
through the wire) plus late_supps' smaller one. Candidate shape: both
per-order facts become windowed min/max over the SAME l_orderkey
partitioning the late-join already established —
  EXISTS other supplier      <=> min(suppkey) != max(suppkey)
  NOT EXISTS other late supp <=> min(late suppkey) == max(late suppkey)
so lineitem crosses the wire ONCE and the two aggregates collapse into
one WindowExec pass (a per-partition sort on the already-shuffled key).

    python tools/ab_q21_r10.py --out AB_Q21_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = "/tmp/bench10x/x100"


def q21_window(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.catalog import load

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
        .hint("shuffle_hash")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = joined.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        (F.min("l_suppkey").over(w) != F.max("l_suppkey").over(w)).alias(
            "has_other_supp"
        ),
        F.min(late_supp).over(w).alias("late_min"),
        F.max(late_supp).over(w).alias("late_max"),
    )
    blamed = per_order.filter(
        F.col("is_late")
        & F.col("has_other_supp")
        & (F.col("late_min") == F.col("late_max"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def main() -> int:
    out_path = "AB_Q21_local.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark(
        "ab_q21_r10",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, FIXTURE).count()
        dt = time.perf_counter() - t0
        release_checkpoints(spark)
        return round(dt, 2)

    cur = REGISTRY["tpch_q21_waiting_supplier"].fn
    # equality of results first (cheap tier), then interleaved timings
    small = "/root/testdata/sf0.01"
    a = sorted(tuple(r) for r in cur(spark, small).collect())
    b = sorted(tuple(r) for r in q21_window(spark, small).collect())
    assert a == b, "window q21 disagrees with registered q21 at sf0.01"

    run(cur)  # warm
    run(q21_window)
    old, new = [], []
    for _ in range(2):
        old.append(run(cur))
        new.append(run(q21_window))
    artifact = {
        "date": "2026-08-15",
        "fixture": FIXTURE,
        "results_equal_sf001": True,
        "current_two_exchange": old,
        "window_one_exchange": new,
        "speedup_min": round(min(old) / min(new), 2),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
