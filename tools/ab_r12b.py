"""Round-12 session-2 interleaved A/B at the 100x tier: the three keys
still >2x with an open (untried) reduction after the first r12 pass.

* q10 — TOP-K BEFORE THE CUSTOMER JOIN. Revenue per customer is
  complete at the o_custkey aggregation (c_name / n_name are
  functionally dependent on the key), and the ORDER BY keys
  (revenue DESC, c_custkey) are all available there too — so the
  LIMIT 20 commutes below the customer join. The shipped r12 shape
  still sort-merges the FULL 15M-row customer table on c_custkey just
  to decorate 20 survivors; the new shape takes top-20 on the ~1M-row
  per-customer aggregate (TakeOrderedAndProject, no exchange) and
  broadcast-joins those 20 rows into the customer scan — the custkey
  exchange disappears entirely.
* q12 — two variants against the shipped shape:
  (a) shj: the orders build side gets the shuffle_hash hint the rest
      of the family got in r12 (q12 was skipped: it was adjudicated as
      box drift, but its 2.99x has now outlived two sweeps);
  (b) agg: per-orderkey pre-aggregation carrying the shipdate multiset
      as an array (lineitem arrives orderkey-clustered, so the
      map-side collect_list partials collapse ~4:1 before the
      exchange), the join meets one thin row per order, lateness
      counts come from size(filter(dates, d > cutoff)), and the final
      2-row pivot is a single global aggregate + in-memory unpivot —
      the post-join groupBy exchange disappears too.
* clean_corpus — the row_number window (exchange + per-partition SORT
  over every surviving doc) becomes groupBy(content_key).agg(min_by)
  — same survivor (min doc_id), map-side-combinable, no sort. 3.54x
  at 100x, and the sort is the non-linear part at scale.

    python tools/ab_r12b.py --out AB_R12B_100X.json [n_runs] [only...]
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


def q10_new(spark, sf_dir):
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    top = (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
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


def q12_shj(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late_after"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("high"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(F.col("l_shipdate") > F.col("late_after"), "late").otherwise(
                "ontime"
            ),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def q12_agg(spark, sf_dir):
    ships = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.collect_list("l_shipdate").alias("ship_dates"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late_after"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("high"),
    )
    per_order = (
        ships.join(o.hint("shuffle_hash"), ships.l_orderkey == o.o_orderkey)
        .select(
            F.size(
                F.filter("ship_dates", lambda d: d > F.col("late_after"))
            ).alias("n_late"),
            F.size("ship_dates").alias("n_lines"),
            "high",
        )
    )
    sums = per_order.agg(
        F.sum(F.when(F.col("high"), F.col("n_late")).otherwise(0)).alias("lh"),
        F.sum(F.when(~F.col("high"), F.col("n_late")).otherwise(0)).alias("ll"),
        F.sum(
            F.when(F.col("high"), F.col("n_lines") - F.col("n_late")).otherwise(0)
        ).alias("oh"),
        F.sum(
            F.when(~F.col("high"), F.col("n_lines") - F.col("n_late")).otherwise(0)
        ).alias("ol"),
    )
    # 1-row aggregate -> 2-row pivot, no exchange
    return sums.selectExpr(
        "stack(2, 'late', lh, ll, 'ontime', oh, ol) "
        "AS (ship_bucket, high_line_count, low_line_count)"
    ).orderBy("ship_bucket")


def clean_corpus_new(spark, sf_dir):
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
    keep = F.struct("doc_id", "lang", "source", "n_chars", "n_tokens")
    return (
        filtered.groupBy("content_key")
        .agg(F.min_by(keep, "doc_id").alias("k"))
        .select("k.doc_id", "k.lang", "k.source", "k.n_chars", "k.n_tokens")
    )


OLD_KEYS = {
    "q10": "tpch_q10_returned_items",
    "q12": "tpch_q12_late_lines",
    "clean": "llm_clean_corpus",
}
NEW_FNS = {
    "q10_new": ("q10", q10_new),
    "q12_shj": ("q12", q12_shj),
    "q12_agg": ("q12", q12_agg),
    "clean_new": ("clean", clean_corpus_new),
}


def main() -> None:
    out_path = "AB_R12B_100X.json"
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
    for vname, (short, fn) in NEW_FNS.items():
        if only and short not in only:
            continue
        variants[vname] = fn
    spark = get_spark("ab_r12b", shuffle_partitions=64)
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
