"""Round-12 interleaved A/B at the 100x tier: the orders x lineitem
SMJ family (verdict item 1) — OLD registry shape vs NEW
reduce-before-exchange shape, plus the item-2/6 re-adjudications
(join_role_playing_dates, analytics_dau_wau, ts_seasonal_baseline)
whose prior verdicts may be box drift.

New shapes under test (the q11/q2/q16/q5/q7 protocol):

* q3  — lineitem pre-aggregates revenue per l_orderkey BEFORE the
  orderkey join (the final group is per-order anyway: o_orderdate and
  o_orderpriority are functionally dependent on the key), so the join
  meets 1 row per shipped order instead of every line, and no
  post-join aggregation exists at all. BUILDING prunes orders through
  a semi join before their exchange.
* q4  — EXISTS(l_shipdate > o_orderdate + 60) == max(l_shipdate) >
  o_orderdate + 60: the 60M-row semi-join side collapses to one
  (l_orderkey, max_shipdate) row per order via a map-side-combinable
  max (lineitem arrives clustered by orderkey, so partials collapse
  ~4:1 before the exchange), and the sort-merge semi over 60M raw
  rows becomes a thin 15M-vs-15M join.
* q8  — ASIA prunes the orders side BELOW the fact-fact join (the q5
  protocol): orders join only ASIA customers' keys, lineitem carries
  only (orderkey, volume, supp_nation) after its dim joins, and the
  custkey exchange of the joined FACT disappears.
* q10 — revenue per order first (returned lines only), then the
  orderkey join against the 7.6%-selective order window, then a
  custkey pre-aggregation BEFORE the customer join: the customer SMJ
  meets <=1 row per buying customer, not every returned line.
* q18 — the HAVING pre-aggregation already exists; the new shape
  prunes orders' columns before the join and keeps the big-orders
  probe on the agg side (AQE broadcasts the 47k survivors).

    python tools/ab_r12.py --out AB_TPCH100X_r12.json [n_runs]
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


def q3_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = li.groupBy("l_orderkey").agg(F.round(F.sum(_net()), 2).alias("revenue"))
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    return (
        rev.join(o.hint("shuffle_hash"), rev.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q4_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        o.join(last_ship, o.o_orderkey == last_ship.l_orderkey)
        .filter(F.col("last_ship") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q8_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # bounded: nation x region <= 25 rows
    n_asia = F.broadcast(
        n.join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey).select(
            F.col("n_nationkey").alias("cnk")
        )
    )
    c2 = c.join(n_asia, c.c_nationkey == F.col("cnk")).select("c_custkey")
    # bounded: nation <= 25 rows
    s2 = s.join(
        F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li2 = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s2, li.l_suppkey == F.col("s_suppkey"))
        .select("l_orderkey", vol.alias("volume"), "supp_nation")
    )
    o2 = o.join(c2, o.o_custkey == F.col("c_custkey")).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        li2.join(o2, li2.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg((F.round(F.sum(nat_vol) / F.sum("volume"), 6) + 0.0).alias("mkt_share"))
    )


def q10_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        # bounded: nation <= 25 rows
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q18_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("qty", 2).alias("sum_qty"),
        )
    )


OLD_KEYS = {
    "q3": "tpch_q3_shipping_priority",
    "q4": "tpch_q4_priority_exists",
    "q8": "tpch_q8_market_share",
    "q10": "tpch_q10_returned_items",
    "q18": "tpch_q18_large_orders",
    "roleplay": "join_role_playing_dates",
    "dau_wau": "analytics_dau_wau",
    "seasonal": "ts_seasonal_baseline",
}
NEW_FNS = {"q3": q3_new, "q4": q4_new, "q8": q8_new, "q10": q10_new, "q18": q18_new}


def main() -> None:
    out_path = "AB_TPCH100X_r12.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    only = [a for a in args if not a.isdigit()]
    n = int([a for a in args if a.isdigit()][0]) if any(a.isdigit() for a in args) else 3
    variants = {}
    for short, key in OLD_KEYS.items():
        if only and short not in only:
            continue
        variants[f"{short}_old"] = (lambda k: lambda s, d: REGISTRY[k].fn(s, d))(key)
        if short in NEW_FNS:
            variants[f"{short}_new"] = NEW_FNS[short]
    spark = get_spark("ab_r12", shuffle_partitions=64)
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
