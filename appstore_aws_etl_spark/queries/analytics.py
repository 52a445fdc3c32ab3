"""Composite analytics queries — TPC-H-style multi-join pipelines.

These are the end-to-end shapes a warehouse user actually runs
(selective dim filter -> fact join -> grouped agg -> top-k), adapted to
the fixture schema. Scale shape: dims broadcast, the single big
shuffle is the fact-side aggregation key, top-k never sorts the full
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.scd import scd2_apply, snapshot_diff
from ..operators.timeseries import gapfill_rollup
from ..operators.upsert import merge_upsert
from ..registry import query, sql_query


def _net(col_price="l_extendedprice", col_disc="l_discount"):
    return F.col(col_price) * (1 - F.col(col_disc))


@query(
    "ts_gapfill_rollup",
    oracle="""
    WITH rolled AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    ), spans AS (
        SELECT user_id, min(bucket) AS f, max(bucket) AS l
        FROM rolled GROUP BY user_id
    ), dense AS (
        SELECT user_id, unnest(generate_series(f, l, INTERVAL 1 HOUR)) AS bucket
        FROM spans
    )
    SELECT d.user_id, d.bucket,
           coalesce(r.n_events, 0)    AS n_events,
           coalesce(r.sum_value, 0.0) AS sum_value
    FROM dense d LEFT JOIN rolled r
      ON d.user_id = r.user_id AND d.bucket = r.bucket
    """,
    tags=("analytics", "timeseries", "custom-operator"),
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate with gap filling: dense
    hourly per-user activity, zero rows for silent hours inside each
    user's activity span (operators/timeseries.py)."""
    ev = load(spark, sf_dir, "events")
    return gapfill_rollup(ev, key="user_id", ts="ts", grain="1 hour", agg_col="value")


@query(
    "etl_merge_upsert",
    oracle="""
    WITH source AS (
        SELECT c_custkey, c_name, c_nationkey,
               round(c_acctbal * 1.1, 4) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT
        coalesce(t.c_custkey, s.c_custkey) AS c_custkey,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name       ELSE t.c_name       END AS c_name,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey  ELSE t.c_nationkey  END AS c_nationkey,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal    ELSE t.c_acctbal    END AS c_acctbal,
        CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
    FROM customer t FULL JOIN source s ON t.c_custkey = s.c_custkey
    """,
    tags=("etl", "custom-operator"),
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed insert-or-replace serving-table refresh: every third
    customer arrives as an update with a 10% balance bump; the rest
    pass through (operators/upsert.py)."""
    target = load(spark, sf_dir, "customer")
    source = target.filter(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") * 1.1, 4)
    )
    return merge_upsert(target, source, keys=["c_custkey"])


@query(
    "etl_scd2_history",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, round(c_acctbal + 100, 4) AS c_acctbal
        FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT c.c_custkey, c.c_acctbal,
           TIMESTAMP '1990-01-01'                                    AS valid_from,
           CASE WHEN u.c_custkey IS NOT NULL THEN TIMESTAMP '2000-01-01' END AS valid_to,
           u.c_custkey IS NULL                                       AS is_current
    FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
    UNION ALL
    SELECT c_custkey, c_acctbal,
           TIMESTAMP '2000-01-01' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           TRUE AS is_current
    FROM upd
    """,
    tags=("etl", "custom-operator"),
)
def etl_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance: a balance-update batch closes
    each affected customer's open row and appends a new open row
    (operators/scd.py)."""
    c = load(spark, sf_dir, "customer")
    history = c.select(
        "c_custkey",
        "c_acctbal",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 100, 4).alias("c_acctbal"),
            F.lit("2000-01-01 00:00:00").cast("timestamp").alias("eff_ts"),
        )
    )
    return scd2_apply(history, updates, key="c_custkey", eff_ts_col="eff_ts")


@query(
    "etl_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 5 <> 4
    ), new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 50, 4)
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 5 <> 3
    )
    SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                WHEN n.c_acctbal = o.c_acctbal AND n.c_mktsegment = o.c_mktsegment
                     THEN 'unchanged'
                ELSE 'changed' END AS change,
           n.c_acctbal, n.c_mktsegment
    FROM new n FULL JOIN old o ON n.c_custkey = o.c_custkey
    """,
    tags=("etl", "custom-operator"),
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two dimension snapshots: keys tagged added/removed/
    changed/unchanged (operators/scd.py). The synthetic snapshots drop
    one residue class each and bump balances in a third."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    old = c.filter(F.col("c_custkey") % 5 != 4)
    new = c.filter(F.col("c_custkey") % 5 != 3).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 5 == 0, F.round(F.col("c_acctbal") + 50, 4)
        ).otherwise(F.col("c_acctbal")),
    )
    return snapshot_diff(old, new, key="c_custkey")


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*)                                    AS n,
           round(min(o_totalprice), 2)                 AS lo,
           round(max(o_totalprice), 2)                 AS hi
    FROM orders GROUP BY 1
    """,
    tags=("agg",),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via arithmetic bucketing (the engine-
    portable form of width_bucket)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    tags=("analytics",),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: unshipped high-value BUILDING orders.

    customer is filtered before the join (broadcastable dim); the only
    large shuffle keys on l_orderkey for the aggregation; the final
    top-10 is TakeOrderedAndProject.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("analytics",),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume: revenue where customer and supplier
    share an ASIA nation. The nation/region/supplier dims broadcast;
    the fact chain shuffles once per equi-key."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
      AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("analytics",),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned items: customers generating the most returned
    revenue in a quarter."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# Correlated subqueries, registered as the same SQL text on both
# engines: Catalyst must decorrelate them into semi/aggregate joins
# (SURVEY.md §4.1 "subquery decorrelation"); the plans are asserted
# join-shaped by the plan lint (no nested loops).
sql_query(
    "sub_scalar_correlated",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("subquery",),
)

sql_query(
    "sub_in_subquery",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > 250000
    """,
    tags=("subquery",),
)

sql_query(
    "sub_not_in_anti",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    tags=("subquery",),
)


@query(
    "agg_decimal_money",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS VARCHAR)                    AS sum_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(12,0)))
                     AS DECIMAL(18,2)) AS VARCHAR)                    AS sum_charge,
           CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS min_price,
           CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "decimal"),
)
def agg_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money-typed aggregation end-to-end in DecimalType (SURVEY.md
    §1.2; the Redshift-serving shape of reference README.md:2).

    Prices become DECIMAL(18,2) at the scan, the charge product runs
    under SQL decimal precision rules (scale 2 preserved exactly —
    no float drift), and group sums stay decimal through the
    aggregation. The final render casts to VARCHAR on both engines
    because pandas widens Spark decimals to Decimal objects but DuckDB
    decimals to float64 — the string form compares the exact decimal
    digits, which is the point of the type."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(12,0)")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(price).cast("decimal(18,2)").cast("string").alias("sum_price"),
        F.sum(price * qty).cast("decimal(18,2)").cast("string").alias("sum_charge"),
        F.min(price).cast("string").alias("min_price"),
        F.max(price).cast("string").alias("max_price"),
    )
