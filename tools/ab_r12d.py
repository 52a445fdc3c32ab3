"""Round-12 session-2 A/B #3: residual probes on the keys still >2x
after the second pass.

* q10_preagg — revenue pre-aggregated per l_orderkey BEFORE the
  order-slice join (the q3 trick): lineitem arrives orderkey-clustered
  so map-side partials collapse ~4:1 before the exchange; the join
  then meets one thin row per returned order instead of every line.
* q12_bare — NOT a candidate shape: the bare 60M x 15M shuffled-hash
  orderkey join + count, no aggregation. If this alone reads ~ the
  full key, q12's residual IS the zero-selectivity full-fact join and
  gets a named constant instead of another re-plan.
* q13_shj — the customer-side left join gets a shuffle_hash hint
  (build = the per-customer count table), skipping the SMJ sort of
  the full customer relation.

    python tools/ab_r12d.py --out AB_R12D_100X.json [n_runs] [only...]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.queries.analytics import _net
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")


def q10_preagg(spark, sf_dir):
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    rev_per_order = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(_net()).alias("rev"))
    )
    top = (
        rev_per_order.join(o.hint("shuffle_hash"), F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_custkey")
        .limit(20)
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    return (
        # bounded: top is LIMIT 20
        c.join(F.broadcast(top), c.c_custkey == F.col("o_custkey"))
        # bounded: nation <= 25 rows
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
    )


def q12_bare(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late_after"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("high"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey).select(
        F.lit(1).alias("one")
    )


def q13_shj(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.join(counts.hint("shuffle_hash"), c.c_custkey == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


VARIANTS = {
    "q10_cur": lambda s, d: REGISTRY["tpch_q10_returned_items"].fn(s, d),
    "q10_preagg": q10_preagg,
    "q12_cur": lambda s, d: REGISTRY["tpch_q12_late_lines"].fn(s, d),
    "q12_bare": q12_bare,
    "q13_cur": lambda s, d: REGISTRY["tpch_q13_customer_distribution"].fn(s, d),
    "q13_shj": q13_shj,
}


def main() -> None:
    out_path = "AB_R12D_100X.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    only = [a for a in args if not a.isdigit()]
    n = int([a for a in args if a.isdigit()][0]) if any(a.isdigit() for a in args) else 5
    variants = {
        k: v for k, v in VARIANTS.items() if not only or any(k.startswith(o) for o in only)
    }
    spark = get_spark("ab_r12d", shuffle_partitions=64)
    rows = {}
    for name, fn in variants.items():  # untimed warm per variant
        rows[name] = fn(spark, FIXTURE).count()
        release_checkpoints(spark)
    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(n):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, FIXTURE).count()
            times[name].append(round(time.perf_counter() - t0, 2))
            release_checkpoints(spark)
    med = {v: sorted(ts)[len(ts) // 2] for v, ts in times.items()}
    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "config": "local[*] AQE on shuffle=64, warm per variant then "
        f"{n} timed runs interleaved, blocking release between runs",
        "rows": rows,
        "times": times,
        "median": med,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
