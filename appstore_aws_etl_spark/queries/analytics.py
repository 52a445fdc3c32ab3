"""Composite analytics queries — TPC-H-style multi-join pipelines.

These are the end-to-end shapes a warehouse user actually runs
(selective dim filter -> fact join -> grouped agg -> top-k), adapted to
the fixture schema. Scale shape: dims broadcast, the single big
shuffle is the fact-side aggregation key, top-k never sorts the full
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fanout_width, load
from ..operators.scd import scd2_apply, snapshot_diff
from ..operators.timeseries import gapfill_rollup
from ..operators.upsert import merge_upsert
from ..registry import query, sql_query
from ..ckpt import CHECKPOINT_LEVEL


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
    "etl_cdc_apply",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_id AS seq,
               CASE WHEN event_id % 5 = 4 THEN 'D' ELSE 'U' END AS op,
               round(value, 4) AS new_value
        FROM events
    ), last_change AS (
        SELECT user_id, op, new_value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY seq DESC) AS rn
            FROM changes
        ) WHERE rn = 1
    ), snapshot AS (
        SELECT user_id, 0.0 AS value FROM (
            SELECT user_id FROM events
            UNION
            SELECT user_id + 10000000 FROM events
        )
    )
    SELECT s.user_id,
           CASE WHEN c.user_id IS NULL THEN s.value ELSE c.new_value END AS value,
           coalesce(c.op, 'K') AS last_op
    FROM snapshot s LEFT JOIN last_change c ON s.user_id = c.user_id
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    tags=("etl", "custom-operator", "streaming"),
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog apply, last-write-wins: a CDC stream carries ordered
    upserts and deletes per key; applying it means collapsing the
    stream to the LAST change per key (one window, never a per-change
    loop) and merging that onto the snapshot — upserts overwrite,
    deletes drop the row, untouched keys pass through. This is the
    step between etl_snapshot_diff (producing changes) and the serving
    table: how a lakehouse replays a Debezium/binlog feed. The
    changelog is synthesized from events (seq = event_id; every fifth
    change is a delete) so the oracle is exact; the snapshot carries an
    id-offset key range that receives NO changes, so the untouched
    pass-through ('K') branch is genuinely exercised, not dead.

    Scale shape: one shuffle for the per-key window over the changelog
    (row_number DESC, not a sort of the snapshot), one key join; at
    100 TB the changelog is usually <<  the snapshot, so AQE broadcasts
    the collapsed changes."""
    ev = load(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 5 == 4, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.round("value", 4).alias("new_value"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("seq").desc())
    last_change = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "op", "new_value")
    )
    keys = ev.select("user_id")
    snapshot = (
        keys.unionByName(keys.select((F.col("user_id") + 10000000).alias("user_id")))
        .distinct()
        .withColumn("value", F.lit(0.0))
    )
    merged = snapshot.join(last_change, "user_id", "left")
    return merged.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "user_id",
        F.when(F.col("op").isNull(), F.col("value")).otherwise(F.col("new_value")).alias("value"),
        F.coalesce("op", F.lit("K")).alias("last_op"),
    )


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

    Round 12 (100x burn-down, AB_TPCH100X_r12): the group key is
    per-ORDER (o_orderdate / o_orderpriority are functionally dependent
    on l_orderkey), so lineitem pre-aggregates revenue per orderkey
    BEFORE the join — the orderkey exchange then carries one thin
    (key, double) row per shipped order instead of every line, the
    sort-merge's 33M-row sort disappears into a hash aggregation, and
    NO post-join aggregation exists at all. BUILDING prunes orders via
    a semi join before their exchange, and the final join is
    shuffled-hash with the pruned order slice as the build side (a
    3-column date+segment slice of orders, hash-partitioned — per-task
    build stays bounded under the same partition discipline that sizes
    the exchange; the r9 OOM class was a 60M-row RAW-fact build). The
    old shape (full li x o SMJ, then group) measured 5.05 s at the
    100x tier vs 3.8 s for this plan, interleaved. Top-10 is
    TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = li.groupBy("l_orderkey").agg(F.round(F.sum(_net()), 2).alias("revenue"))
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(
            c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    return (
        rev.join(o.hint("shuffle_hash"), rev.l_orderkey == F.col("o_orderkey"))
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
    share an ASIA nation.

    Round 11 (100x burn-down): the ASIA predicate prunes both fact
    sides BELOW the orderkey join — suppliers and customers outside
    the region can never satisfy the shared-nation condition, so
    lineitem joins the ASIA supplier slice first (static
    auto-broadcast, no lineitem shuffle; carries s_nationkey) and
    orders joins the ASIA customer slice (carries c_nationkey). The
    customer-nation = supplier-nation equality then filters the
    reduced orderkey join output, and the nation-name rollup
    broadcasts onto 25-row keys. The former shape shuffled the full
    60M-row fact through the orderkey SMJ, a full custkey exchange,
    and a supplier join before any regional pruning."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # bounded: nation x region <= 25 rows
    n_asia = F.broadcast(
        load(spark, sf_dir, "nation").join(
            F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    s2 = s.join(n_asia, s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey", F.col("s_nationkey").alias("supp_nk"), "n_name"
    )
    c2 = c.join(
        n_asia.select(F.col("n_nationkey").alias("cnk")),
        c.c_nationkey == F.col("cnk"),
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nk"))
    li2 = li.join(s2, li.l_suppkey == s2.s_suppkey)
    o2 = o.join(c2, o.o_custkey == c2.c_custkey)
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(F.col("cust_nk") == F.col("supp_nk"))
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
    revenue in a quarter.

    Round 12 (100x burn-down, AB_TPCH100X_r12): the orderkey join runs
    shuffled-hash with the 7.6%-selective half-year order slice as the
    build side — a 2-long-column projection, hash-partitioned, so the
    per-task hash map stays bounded under partition discipline while
    the 20M returned lines skip the sort-merge's sort entirely. The
    order projection also drops o_orderdate before the exchange (the
    filter consumed it). Runtime bloom push-down of the order keys
    into the lineitem scan was measured and REVERTED: locally the
    per-row probe costs more than the saved in-memory exchange
    (3.0-3.6 s -> 4.7-5.0 s); on a network-shuffle cluster the trade
    reverses, which is why the conf stays a session knob rather than
    a plan change.

    Round 12 second pass (AB_R12B_100X): TOP-K BEFORE THE CUSTOMER
    JOIN. Revenue per customer is complete at the o_custkey aggregate
    (c_name/n_name are functionally dependent on the key) and the
    ORDER BY keys (revenue DESC, custkey) all exist there, so the
    LIMIT 20 commutes below the join — the old shape sort-merged the
    FULL customer table on c_custkey just to decorate 20 survivors.
    Now the per-customer aggregate takes top-20 via
    TakeOrderedAndProject (no exchange) and those 20 rows broadcast
    into the customer scan. Interleaved 5-run medians at 100x:
    5.28 -> 3.91 s. The commute assumes orders.o_custkey ⊆
    customer.c_custkey (the TPC-H FK): under a violation the oracle's
    post-join LIMIT would backfill the freed slot while the pre-join
    top-k would not — on FK-clean data the results are identical, and
    the per-orderkey revenue pre-aggregation variant (which would
    dodge the assumption) measured SLOWER (AB_R12D_100X: 3.51 vs
    3.25 s)."""
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
    "sub_lateral_topk",
    """
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
    tags=("subquery", "lateral"),
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


@query(
    "tpch_q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
    tags=("analytics",),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-style order-priority checking (fixture has no commit/receipt
    dates, so "late" = any line shipped >60 days after the order date;
    TPC-H Q4's correlated EXISTS becomes a left-semi join).

    Round 12 (100x burn-down, AB_TPCH100X_r12): the correlated EXISTS
    over a >-condition is equivalent to a per-order MAX —
    EXISTS(l_shipdate > o_orderdate + 60) <=> max(l_shipdate) >
    o_orderdate + 60 — so the 60M-row semi-join side collapses to one
    (l_orderkey, max_shipdate) row per order via a map-side-combinable
    max BEFORE any join. Lineitem arrives clustered by orderkey, so
    the partial max collapses ~4:1 pre-exchange, and the former
    sort-merge semi over 60M raw lines becomes a thin 15M-vs-15M
    equi-join + filter. Interleaved at the 100x tier: 6.7-7.6 s (semi
    shape) -> ~5.0 s; a shuffle_hash hint on the aggregated side was
    ALSO tried and lost to sort-merge (5.2-5.5 s — both sides are
    15M rows, so the hash build beats neither sort), consistent with
    the r8 finding that removed the original hint."""
    li = load(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        o.join(last_ship, o.o_orderkey == last_ship.l_orderkey)
        .filter(F.col("last_ship") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("analytics",),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue change: pure scan-filter-aggregate — the
    query whose whole cost is predicate pushdown + a one-row global agg
    (no shuffle beyond the partial-agg exchange)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("analytics",),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two trading nations.

    Round 11 (100x burn-down): the two-nation predicate prunes BOTH
    fact sides BELOW the orderkey join. Suppliers outside the two
    nations can never satisfy the pair filter, so lineitem joins the
    2/25-nation supplier slice first (small enough for the static
    auto-broadcast — no lineitem shuffle) and shrinks ~12x before the
    big join; symmetrically, orders joins the two-nation customer
    slice first. The former shape carried the full 60M-row fact
    through the orderkey SMJ and a second full exchange on custkey,
    then discarded 24/25ths of it at the pair filter above the joins.
    The residual pair filter (excluding N1-N1/N2-N2 combos) is
    evaluated on the reduced join output, exactly the oracle's
    scope."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    # bounded: nation projection <= 25 rows
    s2 = s.join(F.broadcast(n1), s.s_nationkey == F.col("sk")).select(
        "s_suppkey", "supp_nation"
    )
    # bounded: nation projection <= 25 rows
    c2 = c.join(F.broadcast(n2), c.c_nationkey == F.col("ck")).select(
        "c_custkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    li2 = li.join(s2, li.l_suppkey == s2.s_suppkey)
    o2 = o.join(c2, o.o_custkey == c2.c_custkey)
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
    )


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=("analytics",),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion-revenue share: month-sliced fact, broadcast part
    dim, one conditional global aggregate.

    r13 probe (AB_R13C_100X, measured dead end): pre-aggregating the
    month slice to partkey grain so AQE broadcasts the agg output and
    the part side never shuffles LOST 1.52 -> 1.97 s median — the
    month slice is already small enough that the extra aggregation
    costs more than the join exchange it removes. Residual vs DuckDB
    (0.15 s) is the class-4 session floor (BASELINE.md r13)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    net = _net()
    promo = F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(net), 4).alias("promo_share")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("analytics",),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarter revenue per supplier, scalar-subquery
    max, equality join back — the revenue aggregate is computed once
    and reused for both the max and the final join (Spark reuses the
    exchange; rounding is pinned before the max so ties are exact).

    r13 probe (AB_R13D2_100X, measured dead end): filtering rev to the
    argmax rows BEFORE the supplier join (so AQE broadcasts the ~1-row
    side and supplier never shuffles) measured 1.95 vs 1.85 s median —
    a wash: AQE already runtime-broadcasts the 100k-row rev relation
    in the shipped shape, so the reorder removes nothing. Residual vs
    DuckDB (0.33 s) is the quarter-slice agg + session floor."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(_net()), 2).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.suppkey)
        # bounded: 1-row global max
        .join(F.broadcast(top), F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           round(o_totalprice, 2) AS total_price,
           round(sum_qty, 2) AS sum_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
    ) big ON o_orderkey = big.l_orderkey
    """,
    tags=("analytics",),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: the HAVING pre-aggregation runs on
    lineitem alone (map-side partials, one shuffle on l_orderkey) and
    only the surviving order keys (0.3% at the 100x tier) join
    orders/customer; orders and customer are column-pruned to exactly
    the output columns before their joins.

    Round 12 adjudication (AB_TPCH100X_r12): the residual cost IS the
    pre-aggregation — 60M lines into 14.7M orderkey groups measures
    2.4-3.4 s alone at the 100x tier (the joins add <1 s; AQE
    broadcasts the 47k survivors), and no further reduction exists:
    the HAVING needs every line's quantity, the filter cannot apply to
    partials, and the obvious knobs were measured (input splits
    128m->32m: 3.1->2.4 s, the only lever; runtime bloom: n/a — the
    agg, not a join, dominates). The DuckDB gap on this key is the
    ORDERKEY_AGG_FLOOR constant (BASELINE.md): a single-process radix
    hash agg does the same 60M->14.7M collapse with no exchange at
    all."""
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


@query(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("analytics",),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under disjunctive brand/size/quantity
    predicates — the join stays a plain equi-join on partkey with the
    OR-of-ANDs applied after (Catalyst can't split a cross-table OR
    into join keys; what matters is that it does NOT become a
    nested-loop join)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_net()), 2).alias("revenue"))
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n_name
    """,
    tags=("analytics",),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-style global-sales-opportunity: above-average-balance
    customers with no recent orders (fixture has no phone country
    codes, so nations group the result; the NOT EXISTS is a left-anti
    join against the date-pruned orders slice, and the scalar average
    broadcasts as a one-row cross join)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        # bounded: 1-row scalar aggregate
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        # bounded: nation <= 25 rows
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0 END) / sum(volume), 6) + 0.0 AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY o_year
    """,
    tags=("analytics",),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_5's slice of PROMO-part revenue
    sold into ASIA, by order year (fixture nations are NATION_N).

    Scale shape: part/supplier/customer/nation/region are broadcast
    dims; the only big shuffle is orders<->lineitem on orderkey, and
    the share is a two-measure conditional aggregate over one pass —
    never two scans of the fact.

    Round 12 adjudication (AB_TPCH100X_r12 session): the q5-protocol
    re-plan (ASIA pushed below the fact-fact join via a customer-keys
    semi on orders, lineitem slimmed to (orderkey, volume,
    supp_nation) before the orderkey join) was built and measured
    interleaved — and LOST: 5.35 s vs 4.75 s for this shape at the
    100x tier. Unlike q5, the dim filters here (PROMO part) already
    prune lineitem before the orderkey join, so the re-plan only
    reordered broadcasts it already gets from AQE while adding a
    projection barrier. Kept as-is; measured dead end recorded."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # bounded: nation <= 25 rows
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        # bounded: region <= 5 rows
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        # bounded: nation <= 25 rows
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year(o.o_orderdate).alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return joined.groupBy("o_year").agg(
        (F.round(F.sum(nat_vol) / F.sum("volume"), 6) + 0.0).alias("mkt_share")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("analytics",),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (fixture has no order
    comments, so the excluded class is '1-URGENT' priority instead of
    'special requests'; the exclusion lives in the JOIN predicate, not
    a WHERE, so order-less customers still count as 0).

    Scale shape (re-planned round 9, the 100x 6.9x-vs-DuckDB key): the
    per-customer count is pushed BELOW the join — orders aggregates
    alone on o_custkey (map-side partials collapse the fact ~10:1
    before its exchange), then the count table left-joins customer at
    customer grain with COALESCE(cnt, 0) restoring order-less
    customers. Equivalent to counting after a left join because
    o_orderkey is never null in matched rows; the join's right side
    shrinks from every order row to one row per ordering customer.
    A shuffle_hash hint on the count build side was probed at the
    100x tier and is a WASH (AB_R12D_100X: 1.27 vs 1.32 s — the SMJ
    sort it avoids runs over a single-long-column relation), so the
    unhinted shape ships; the residual vs DuckDB is the two-exchange
    floor of any Spark plan against a single-process radix join."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.join(counts, c.c_custkey == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("analytics",),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue (fixture has no p_container, so
    the part slice is brand-only). The correlated scalar subquery is
    decorrelated by hand: per-part average quantity computed once over
    the brand-filtered fact, joined back on partkey.

    Scale shape: the single-brand part slice prunes lineitem before
    anything heavy shuffles (AQE broadcasts it when observed-small —
    a ~1/25 slice of part still scales linearly with SF, so the hint
    is not forced); the avg and the probe reuse that pruned slice, so
    the heavy table is read once and shuffled once on partkey."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "analytics_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              CAST(date_trunc('week', e.ts) AS TIMESTAMP)) // 7
                    AS BIGINT) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
    tags=("analytics", "events"),
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the event stream: users grouped by
    first-activity week, counted in each later week they reappear —
    the standard growth-analytics rollup.

    Scale shape: ONE user-keyed exchange total. r13 got there with
    ``collect_set(week)`` + array_min + explode; round 14 replaces the
    ObjectHashAggregate set-building with plain row machinery over the
    SAME single exchange: the explicit ``repartition(user_id)`` is the
    one wide exchange, the (user, week) distinct-pair aggregate
    clusters on a superset of the partitioning key (no new exchange),
    and the cohort week is a ``min() over (partition by user_id)``
    window on the already-partitioned rows — no per-group set objects,
    no explode, fully codegen'd. Interleaved 100x A/B
    (AB_AUDIT100X_r14): 1.35 -> 1.12 s median (−17 %); same rows by
    construction (distinct weeks per user with their per-user min).
    Week state stays calendar-bounded exactly as before."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    pairs = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .repartition("user_id")
        .groupBy("user_id", "week")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("user_id")
    return (
        pairs.select(F.min("week").over(w).alias("cohort_week"), "week")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "util_table_profile",
    oracle="""
    SELECT count(*)                                   AS n_rows,
           count(DISTINCT l_partkey)                  AS ndv_partkey,
           count(DISTINCT l_returnflag)               AS ndv_returnflag,
           count(*) - count(l_extendedprice)          AS nulls_extendedprice,
           round(min(l_extendedprice), 2)             AS min_extendedprice,
           round(max(l_extendedprice), 2)             AS max_extendedprice,
           round(avg(l_quantity), 4)                  AS avg_quantity,
           CAST(min(l_shipdate) AS TIMESTAMP)         AS min_shipdate,
           CAST(max(l_shipdate) AS TIMESTAMP)         AS max_shipdate
    FROM lineitem
    """,
    tags=("analytics", "util"),
)
def util_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile in one pass: row count, per-column
    distinct counts, null counts, min/max/avg — the stats a cost-based
    optimizer or data-quality monitor collects. One scan, one partial-
    aggregated exchange; at 100 TB the exact NDVs would switch to
    approx_count_distinct (registered separately as agg_approx_distinct)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("ndv_partkey"),
        F.countDistinct("l_returnflag").alias("ndv_returnflag"),
        (F.count(F.lit(1)) - F.count("l_extendedprice")).alias("nulls_extendedprice"),
        F.round(F.min("l_extendedprice"), 2).alias("min_extendedprice"),
        F.round(F.max("l_extendedprice"), 2).alias("max_extendedprice"),
        F.round(F.avg("l_quantity"), 4).alias("avg_quantity"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


@query(
    "util_table_fingerprint",
    oracle="""
    SELECT l_returnflag,
           bit_xor(h)                            AS fp_xor,
           CAST(sum(h % 1000000007) AS BIGINT)   AS fp_sum,
           count(*)                              AS n_rows
    FROM (
        SELECT l_returnflag,
               CAST('0x' || substr(md5(concat_ws('|',
                   CAST(l_orderkey AS VARCHAR),
                   CAST(l_partkey AS VARCHAR),
                   CAST(l_suppkey AS VARCHAR),
                   CAST(l_linenumber AS VARCHAR),
                   l_returnflag, l_linestatus,
                   strftime(l_shipdate, '%Y-%m-%d'),
                   CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))), 1, 14)
                   AS BIGINT) AS h
        FROM lineitem
    )
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("analytics", "util", "integrity"),
)
def util_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent, engine-portable table content fingerprint —
    the standard way to validate a 100 TB replication/CDC/migration
    without sorting or moving the data: every row hashes to a 56-bit
    integer (md5 prefix, identical in any engine), and two commutative
    combiners collapse a partition group to three numbers. XOR detects
    any content difference except even-multiplicity ones; the modular
    SUM (mod 1e9+7 per row, so the running total stays in int64 up to
    ~9e9 rows per group; a 100 TB deployment sums as decimal(38,0)
    instead — exercised at unit level, but int64 here because pandas
    degrades DuckDB's DECIMAL(38,0) to float and would break the exact
    oracle) catches those; COUNT anchors cardinality.
    Matching (fp_xor, fp_sum, n_rows) per group between two copies is
    then a byte-free equality proof, and a mismatch localizes to the
    group — compare per-partition fingerprints to find WHICH partition
    diverged, then drill in.

    Scale shape: one scan, all hashing inside whole-stage codegen, one
    map-side-combinable aggregation to ~|groups| rows — the cheapest
    possible full-table integrity pass. The DuckDB oracle matching
    hash-for-hash IS the cross-engine portability proof (md5 + modular
    prefix, not engine-private xxhash64)."""
    li = load(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
        F.col("l_quantity").cast("bigint").cast("string"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 14), 16, 10).cast("bigint")
    return (
        li.select("l_returnflag", h.alias("h"))
        .groupBy("l_returnflag")
        .agg(
            F.bit_xor("h").alias("fp_xor"),
            F.sum(F.col("h") % 1000000007).alias("fp_sum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "analytics_dau_wau",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
        FROM events
    ), dau AS (
        SELECT day, count(*) AS dau FROM daily GROUP BY day
    ), wau AS (
        SELECT d.day, count(DISTINCT a.user_id) AS wau
        FROM (SELECT DISTINCT day FROM daily) d
        JOIN daily a
          ON a.day <= d.day AND a.day >= d.day - INTERVAL 6 DAY
        GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau, 4) + 0.0 AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
    tags=("analytics", "events"),
)
def analytics_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users and DAU-over-WAU stickiness.

    Trailing-window distinct counts don't decompose into window frames
    (COUNT(DISTINCT) OVER RANGE isn't supported by either engine), and
    a day-range theta join would plan as a nested loop. Rounds 7-9
    used the shift-and-union trick: explode each activity day into the
    7 window-end days it contributes to, then countDistinct — correct,
    but the 7x fan-out re-shuffles into a two-phase distinct and read
    8.5x DuckDB at the 100x tier (the worst non-graph ratio).

    Round-10 shape — interval merge + delta prefix sum, O(activity)
    with NO fan-out and NO countDistinct: a user counts toward WAU(d)
    iff d lies in the union of [a, a+6] over their active days a.
    Per user, merge overlapping 7-day intervals (one user-partitioned
    window: a new interval starts where the gap since the previous
    active day exceeds 6 days), emit +1/-1 boundary deltas, and take a
    running sum over the day spine: WAU(d) = sum of deltas <= d. Every
    user contributes 2 x (their merged-interval count) <= 2 x (their
    active days) rows to the delta stream, so shuffle volume is ~1x
    the deduped activity instead of 7x, and the distinct is gone
    (interval union already dedups coverage). The final running sum is
    a single-partition window at DAY grain — bounded (~365 rows/year
    at any corpus size; a 10-year 100 TB event store is ~3.7k rows),
    the same bounded-spine argument as the old broadcast.

    Round-12 re-adjudication (AB_READJUD_r12): 2.84 s vs DuckDB 1.14 =
    2.49x same-box. The obvious single-exchange re-plan was probed and
    LOST (repartition(user_id) before the distinct reads 3.4-5.1 s vs
    3.0-3.3 s): the current shape's first exchange runs on PARTIALLY
    DEDUPED data (map-side distinct combine), while pre-partitioning
    ships the raw event stream — the two cheap exchanges on reduced
    data beat one full-size exchange. Residual is the dual-aggregation
    exchange floor (distinct + window) over the activity stream."""
    ev = load(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # merge each user's overlapping [day, day+6] coverage intervals:
    # a gap > 6 days since the previous active day opens a new interval
    w = Window.partitionBy("user_id").orderBy("day")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    intervals = (
        daily.withColumn(
            "new_grp",
            F.when(
                F.datediff(F.col("day"), F.lag("day").over(w)) <= 6, 0
            ).otherwise(1),
        )
        .withColumn("grp", F.sum("new_grp").over(run))
        # same-user rows are already co-located by the window's hash
        # partitioning on user_id, so this groupBy adds no exchange
        .groupBy("user_id", "grp")
        .agg(F.min("day").alias("cov_start"), F.max("day").alias("last_day"))
    )
    deltas = intervals.select(
        F.col("cov_start").alias("day"), F.lit(1).alias("d")
    ).unionAll(
        intervals.select(
            F.expr("last_day + make_interval(0, 0, 0, 7)").alias("day"),
            F.lit(-1).alias("d"),
        )
    )
    net = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    days = daily.select("day").distinct().withColumn("observed", F.lit(1))
    spine = days.join(net, "day", "full_outer")
    wsum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wau = (
        spine.withColumn("wau", F.sum(F.coalesce("net", F.lit(0))).over(wsum))
        .filter(F.col("observed") == 1)
        .select("day", "wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.round(F.col("dau") / F.col("wau"), 4) + F.lit(0.0)).alias("stickiness"),
    )


@query(
    "analytics_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("analytics", "events"),
)
def analytics_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-to-event transition counts (the Markov matrix behind
    user-journey analysis): per-user time-ordered lead window, then one
    tiny aggregate over (from, to) pairs. Ties at identical timestamps
    break on event_id so both engines order identically."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "analytics_rfm",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               max(o_orderdate)               AS last_order,
               count(*)                       AS frequency,
               round(sum(o_totalprice), 2)    AS monetary
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT c_custkey, last_order, frequency, monetary,
           ntile(4) OVER (ORDER BY last_order DESC, c_custkey) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency DESC, c_custkey)  AS f_quartile,
           ntile(4) OVER (ORDER BY monetary DESC, c_custkey)   AS m_quartile
    FROM base
    """,
    tags=("analytics",),
)
def analytics_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary with
    quartile scores — the classic CRM rollup. One shuffle on custkey
    for the base aggregate; the three global ntiles are driver-bounded
    (one row per customer, single-partition windows — at 100 TB these
    become approx percentile cutoffs joined back, trading exact ranks
    for a broadcastable 3-number boundary set)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    return base.select(
        "c_custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy(F.col("last_order").desc(), "c_custkey")).alias("r_quartile"),
        F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), "c_custkey")).alias("f_quartile"),
        F.ntile(4).over(Window.orderBy(F.col("monetary").desc(), "c_custkey")).alias("m_quartile"),
    )


@query(
    "util_zorder_layout",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               l_partkey & 65535 AS p, l_suppkey & 65535 AS s
        FROM lineitem WHERE l_orderkey < 1000
    ), s1 AS (
        SELECT *, (p | (p << 8)) & 16711935 AS pa, (s | (s << 8)) & 16711935 AS sa FROM base
    ), s2 AS (
        SELECT *, (pa | (pa << 4)) & 252645135 AS pb, (sa | (sa << 4)) & 252645135 AS sb FROM s1
    ), s3 AS (
        SELECT *, (pb | (pb << 2)) & 858993459 AS pc, (sb | (sb << 2)) & 858993459 AS sc FROM s2
    ), s4 AS (
        SELECT *, (pc | (pc << 1)) & 1431655765 AS pd, (sc | (sc << 1)) & 1431655765 AS sd FROM s3
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           pd | (sd << 1) AS zval
    FROM s4
    """,
    tags=("util", "layout", "custom-operator"),
)
def util_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (partkey, suppkey) — the
    lakehouse OPTIMIZE ZORDER layout step (operators/layout.py). The
    interleave is pure shift/mask arithmetic, bit-identical on any
    engine; the write path sorts by it via repartitionByRange so both
    dimensions get min/max file-statistics locality."""
    from ..operators.layout import zvalue

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zvalue(F.col("l_partkey"), F.col("l_suppkey")).alias("zval"),
    )


@query("agg_hll_rollup", oracle=None, tags=("agg", "approx", "sketch"))
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct rollup: per-day HLL sketches of active
    users unioned into weekly distinct estimates — the incremental
    pattern for distinct counts at 100 TB (daily sketches persist;
    weekly/monthly rollups merge sketches instead of rescanning raw
    events). Engine-specific estimates -> rows-only; accuracy vs exact
    is unit-tested (tests/test_llm.py-style tolerance)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("week")
        .agg(F.hll_union_agg("sketch").alias("wsketch"))
        .select(
            "week",
            F.hll_sketch_estimate("wsketch").alias("approx_users"),
        )
    )


@query(
    "analytics_mom_growth",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS order_month,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT order_month, revenue, n_orders,
           lag(revenue) OVER (ORDER BY order_month) AS prev_revenue,
           round((revenue - lag(revenue) OVER (ORDER BY order_month))
                 / lag(revenue) OVER (ORDER BY order_month) * 100, 2) AS growth_pct
    FROM monthly
    """,
    tags=("analytics", "window"),
)
def analytics_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period (month-over-month) revenue growth: aggregate
    the fact table to month grain, then lag-window the tiny monthly
    series. Scale shape: the only big shuffle is the month-key
    aggregation (partial agg map-side); the global-order window runs
    over one row per month — dimension-sized, never the fact table."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("order_month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "order_month",
        "revenue",
        "n_orders",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 2).alias("growth_pct"),
    )


@query(
    "analytics_abc_class",
    oracle="""
    WITH part_rev AS (
        SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem GROUP BY l_partkey
    ), ranked AS (
        SELECT l_partkey, revenue,
               sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        FROM part_rev
    ), total AS (
        SELECT *, max(cum_rev) OVER () AS total_rev FROM ranked
    )
    SELECT l_partkey, revenue,
           round(cum_rev / total_rev, 6) AS cum_share,
           CASE WHEN cum_rev / total_rev <= 0.80 THEN 'A'
                WHEN cum_rev / total_rev <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM total
    """,
    tags=("analytics", "window"),
)
def analytics_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, cumulative
    revenue share, classified A (first 80%), B (to 95%), C (tail).

    Determinism: per-part revenue is rounded at 2dp before the ordered
    window so group-aggregation order noise can't leak into the cumsum;
    the corpus total is taken as max(cum_rev) — the final value of the
    deterministic ordered running sum — rather than an unordered
    sum() OVER (), so both engines add in the same sequence.
    Scale shape: the fact shuffle reduces to one row per part; the
    global ordered window runs on the part-dimension aggregate. For a
    dimension too large for one partition, swap in a range-partitioned
    two-phase prefix sum (partition-local cumsum + broadcast offsets)."""
    li = load(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(_net()), 4).alias("revenue")
    )
    w = (
        Window.orderBy(F.col("revenue").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = part_rev.withColumn("cum_rev", F.sum("revenue").over(w))
    total = ranked.withColumn(
        "total_rev", F.max("cum_rev").over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    )
    share = F.col("cum_rev") / F.col("total_rev")
    return total.select(
        "l_partkey",
        "revenue",
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias("abc_class"),
    )


@query(
    "analytics_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), nums AS (
        SELECT user_id, day,
               date_diff('day', TIMESTAMP '1970-01-01', day)
                 - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
        FROM days
    ), streaks AS (
        SELECT user_id, anchor, count(*) AS streak_len, min(day) AS streak_start
        FROM nums GROUP BY user_id, anchor
    )
    SELECT user_id,
           count(*) AS n_streaks,
           max(streak_len) AS longest_streak,
           CAST(sum(streak_len) AS BIGINT) AS active_days,
           min(streak_start) AS first_active_day
    FROM streaks GROUP BY user_id
    """,
    tags=("analytics", "window"),
)
def analytics_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user. The
    island anchor is (epoch-day - row_number) — constant within a run of
    consecutive days — so streaks fall out of a plain group-by, no
    iterative logic. Scale shape: distinct + window + two aggs all
    partition by user_id, one shuffle key end-to-end."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    nums = days.withColumn(
        "anchor",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("timestamp")) - F.row_number().over(w),
    )
    streaks = nums.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("day").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("active_days"),
        F.min("streak_start").alias("first_active_day"),
    )


@query(
    "analytics_market_basket",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem
    ), freq AS (
        SELECT l_partkey, count(*) AS cnt FROM op GROUP BY l_partkey
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_count
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.part_a, p.part_b, p.pair_count,
           round(p.pair_count * n.n_orders / (fa.cnt * fb.cnt), 4) AS lift
    FROM pairs p CROSS JOIN n
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b
    WHERE p.pair_count >= 2
    """,
    tags=("analytics", "join"),
)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: pairs of parts appearing
    in the same order, kept when seen together >= 2 times. Scale shape:
    the self-join key is l_orderkey, whose per-key fanout is bounded by
    lines-per-order (~7 in TPC-H), so pair generation is linear in the
    fact table — never an all-pairs part join. Part frequencies are a
    dimension-sized broadcast; the order count is a 1-row broadcast."""
    li = load(spark, sf_dir, "lineitem")
    # fanout width (optimization r13): same pattern as the graph
    # family's _weighted_copurchase_edges — one width-w exchange on the
    # join key serves the distinct, both pair-join sides (exchange
    # reuse), and the pair-count partial aggregation, so the exploding
    # chain's width scales with input bytes, not the session constant.
    w = fanout_width(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", "l_partkey")
        .repartition(w, "l_orderkey")
        .distinct()
    )
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    freq = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = op.alias("a")
    # r8: no static shuffle_hash — the build side is the full distinct
    # (order, part) pair table (linear in the fact, the join_multikey
    # 100x OOM class), and under the session's AQE hash-conversion
    # threshold the unhinted plan measured FASTER at 10x (3.17 s vs
    # 4.98 s hinted)
    b = op.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= 2)
    )
    # freq is keyed by partkey — linear in SF, so never force-broadcast
    # it; AQE broadcasts the projection when observed-small (it was ~tens
    # of MB at the 100x tier but would be ~20B rows at 100 TB).
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        # bounded: 1-row scalar aggregate
        pairs.crossJoin(F.broadcast(n_orders))
        .join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "pair_count",
            F.round(F.col("pair_count") * F.col("n_orders") / (F.col("cnt_a") * F.col("cnt_b")), 4).alias("lift"),
        )
    )


@query(
    "util_data_quality",
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM orders),
    checks AS (
        SELECT 'null_custkey' AS rule,
               CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'nonpositive_price', count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
        UNION ALL
        SELECT 'bad_status', count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
        UNION ALL
        SELECT 'dup_orderkey', count(*) - count(DISTINCT o_orderkey) FROM orders
        UNION ALL
        SELECT 'price_outlier_400k', count(*) FILTER (WHERE o_totalprice > 400000) FROM orders
        UNION ALL
        SELECT 'orphan_custkey', count(*)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT c.rule, c.n_violations, n.n_rows,
           round(c.n_violations * 1.0 / n.n_rows, 6) AS violation_rate
    FROM checks c CROSS JOIN n
    """,
    tags=("util", "quality"),
)
def util_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (dbt-test / Deequ shape): null
    checks, domain checks, uniqueness, referential integrity, and an
    outlier rule, reported as one row per rule with violation rates.
    Scale shape: the five scan rules fold into ONE conditional-
    aggregate pass over the fact table (then unpivot via stack); the
    referential rule is a broadcast anti-join — two fact scans total,
    regardless of rule count."""
    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    wide = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v_null"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v_price"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).alias("v_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_dup"),
        F.sum(F.when(F.col("o_totalprice") > 400000, 1).otherwise(0)).alias("v_outlier"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    scan_rules = wide.select(
        F.expr(
            "stack(5, 'null_custkey', v_null, 'nonpositive_price', v_price, "
            "'bad_status', v_status, 'dup_orderkey', v_dup, "
            "'price_outlier_400k', v_outlier) AS (rule, n_violations)"
        )
    )
    orphans = (
        o.join(cust, o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orphan_custkey").alias("rule"), "n_violations")
    )
    n_df = wide.select("n_rows")
    return (
        scan_rules.unionByName(orphans)
        # bounded: 1-row scalar aggregate
        .crossJoin(F.broadcast(n_df))
        .select(
            "rule",
            "n_violations",
            "n_rows",
            F.round(F.col("n_violations") * 1.0 / F.col("n_rows"), 6).alias("violation_rate"),
        )
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, value,
               avg(value)         OVER win AS mu,
               stddev_samp(value) OVER win AS sigma,
               count(*)           OVER win AS n_win
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value,
           round((value - mu) / sigma, 4)            AS zscore,
           abs(round((value - mu) / sigma, 4)) > 3.0 AS is_anomaly
    FROM w
    WHERE n_win >= 12 AND sigma > 0
    """,
    tags=("analytics", "timeseries", "window"),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    trailing 24 events of the same user (current row excluded), flagged
    when |z| > 3. Warm-up rows (fewer than 12 priors) are suppressed.
    One window spec feeds mean/std/count, so Spark evaluates a single
    partitioned sort — one shuffle on user_id. The anomaly flag
    compares the 4dp-rounded z on both engines so accumulation-order
    noise in stddev can't flip the boundary."""
    ev = load(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("value").over(win)
    sigma = F.stddev_samp("value").over(win)
    z = F.round((F.col("value") - mu) / sigma, 4)
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            z.alias("zscore"),
            (F.abs(z) > 3.0).alias("is_anomaly"),
            F.count(F.lit(1)).over(win).alias("n_win"),
            sigma.alias("_sigma"),
        )
        .filter((F.col("n_win") >= 12) & (F.col("_sigma") > 0))
        .drop("n_win", "_sigma")
    )


@query(
    "ts_ewma",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), walk AS (
        SELECT user_id, event_id, value, rn, CAST(value AS DOUBLE) AS y
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.value, o.rn, (1.0 - 0.2) * w.y + 0.2 * o.value
        FROM walk w JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
    )
    SELECT user_id, event_id, value, round(y, 6) AS ewma FROM walk
    """,
    tags=("analytics", "timeseries", "stateful", "custom-operator"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (alpha=0.2) — a true sequential recurrence, run as one
    pandas-internal group loop per partition (operators/timeseries.py
    ewma; Spark window functions cannot express it without
    overflow-prone pow() tricks). The oracle states the identical
    recurrence as a recursive-CTE row walk per user — y seeds at the
    first value, then y := 0.8*y + 0.2*x in (ts, event_id) order — so
    the operator is exactly hash-checkable (it was rows-only before;
    double arithmetic agrees at round-6, and both sides now round with
    the same HALF_UP/ties-away-from-zero convention — Spark ROUND vs
    DuckDB round())."""
    from ..operators.timeseries import ewma

    ev = load(spark, sf_dir, "events")
    return ewma(ev, key="user_id", ts="ts", value="value", alpha=0.2, order_cols=("event_id",))


@query(
    "ts_interpolate",
    oracle="""
    WITH rolled AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, round(avg(value), 4) AS v
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    ), spans AS (
        SELECT user_id, min(bucket) AS f, max(bucket) AS l FROM rolled GROUP BY user_id
    ), dense AS (
        SELECT user_id, unnest(generate_series(f, l, INTERVAL 1 HOUR)) AS bucket FROM spans
    ), j AS (
        SELECT d.user_id, d.bucket, r.v
        FROM dense d LEFT JOIN rolled r ON d.user_id = r.user_id AND d.bucket = r.bucket
    ), w AS (
        SELECT user_id, bucket, v,
            last_value(v IGNORE NULLS) OVER back AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER back AS pb,
            first_value(v IGNORE NULLS) OVER fwd AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER fwd AS nb
        FROM j
        WINDOW back AS (PARTITION BY user_id ORDER BY bucket ROWS UNBOUNDED PRECEDING),
               fwd  AS (PARTITION BY user_id ORDER BY bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           CASE WHEN v IS NOT NULL THEN v
                ELSE floor((pv + (nv - pv) * ((epoch(bucket) - epoch(pb))
                                              / (epoch(nb) - epoch(pb))))
                           * 10000.0 + 0.5) / 10000.0
           END AS value_interp,
           v IS NULL AS is_gap
    FROM w
    """,
    tags=("analytics", "timeseries", "custom-operator"),
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style `interpolate()`: dense hourly per-user series
    where every silent hour carries the time-weighted linear
    interpolation between its bracketing observed buckets — the
    smooth-fill companion to ts_gapfill_rollup's zero-fill
    (operators/timeseries.py interpolate_linear). One rollup shuffle +
    one per-key window sort; both carry frames are O(1) running state,
    so a key's span length never buffers."""
    from ..operators.timeseries import interpolate_linear

    ev = load(spark, sf_dir, "events")
    return interpolate_linear(ev, key="user_id", ts="ts", value="value", grain="1 hour")


@query(
    "util_compaction_plan",
    oracle="""
    SELECT doc_id, source,
           CAST(floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING)
                       - n_chars) / 4000.0) AS BIGINT) AS file_bin
    FROM documents
    ORDER BY source, doc_id
    """,
    tags=("util", "maintenance"),
)
def util_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: within each source partition,
    assign documents to target output files by running-size bin
    packing (first-fit in id order, 4000-char target — the same
    cumulative-sum-over-start-offset trick OPTIMIZE/compaction jobs
    use to group small files into ~128 MB outputs without a driver
    loop).

    Scale shape: one shuffle on the partition column, one
    running-sum window per partition — the plan is a pure metadata
    pass; the actual rewrite would then repartition by file_bin so
    each output task writes exactly one compacted file."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start_offset = F.sum("n_chars").over(w) - F.col("n_chars")
    return docs.select(
        "doc_id",
        "source",
        F.floor(start_offset / 4000.0).alias("file_bin"),
    ).orderBy("source", "doc_id")


@query(
    "sub_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE tree AS (
        SELECT p_partkey AS node, CAST((p_partkey - 1) // 7 AS BIGINT) AS parent
        FROM part WHERE p_partkey > 0
    ), walk(node, anc, depth) AS (
        SELECT node, parent, 1 FROM tree
        UNION ALL
        SELECT w.node, t.parent, w.depth + 1
        FROM walk w JOIN tree t ON w.anc = t.node
        WHERE w.anc > 0
    )
    SELECT node,
           max(depth) AS depth,
           coalesce(arg_max(anc, depth) FILTER (WHERE anc > 0), node) AS top_branch
    FROM walk GROUP BY node ORDER BY node
    """,
    tags=("subquery", "iterative", "custom-operator"),
)
def sub_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (recursive-CTE) query: walk a 7-ary part hierarchy
    (parent(n) = (n-1) div 7, root 0) to each node's depth and its
    top-level branch (the ancestor directly under the root). The
    oracle is DuckDB's literal WITH RECURSIVE; Spark has no recursive
    CTE, so the engine expresses the same fixpoint by POINTER DOUBLING
    over the parent RELATION (a real self-join per round, not
    arithmetic — the hierarchy could equally come from a foreign key):
    each row carries (anc = ancestor ``depth`` steps up, the
    under-root branch once its path reaches the root), and each round
    composes every pointer with its ancestor's pointer, doubling the
    distance covered. A walk whose ancestor key is absent from the
    relation stops AT that ancestor — depth and top_branch then match
    the oracle's inner-join termination exactly (no phantom +1 step).

    Scale shape: O(log depth) rounds (vs depth rounds for the naive
    level walk) over a SHRINKING FRONTIER (round 11, 100x burn-down).
    A row leaves the frontier the round it stops advancing (its
    pointer reached the root or an absent ancestor — both terminal
    forever, since the up side always covers every relation node), so
    converged rows are checkpointed ONCE into an accumulator instead
    of re-joined, re-checkpointed and re-counted every round; the
    per-round join/checkpoint/count run over the frontier only. On
    the 100x fixture that's one full-width round (99% of rows stop
    at their first absent ancestor) and then kilobyte rounds. Once
    the counted frontier fits a broadcast (<= 200k rows), the
    compose join flips from shuffle-SMJ to scanning the checkpointed
    map with the frontier broadcast as an inner probe + a broadcast
    anti for the terminal misses — no shuffle, no sort, no wide
    checkpoint, the frontier analogue of AQE's runtime SMJ->BHJ
    re-plan, decided on a measured count rather than an estimate."""
    part = load(spark, sf_dir, "part")
    ptr0 = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("node"),
        F.floor((F.col("p_partkey") - 1) / 7).cast("long").alias("anc"),
        F.lit(1).cast("long").alias("depth"),
        F.when(F.floor((F.col("p_partkey") - 1) / 7) == 0, F.col("p_partkey")).alias(
            "top_branch"
        ),
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    # rows born terminal (direct children of the root) never join
    done_frames = [ptr0.filter(F.col("anc") == 0)]
    live = ptr0.filter(F.col("anc") > 0)
    live_n = live.count()
    _BCAST_FRONTIER = 200_000  # ~10 MB of (4 longs)-rows, the BHJ cutoff
    # Pointer doubling covers 2^k ancestors after k rounds, so 64
    # rounds suffice for any acyclic hierarchy that fits in a long.
    # A CYCLE in the parent relation (possible for FK-sourced
    # hierarchies, which the docstring invites) would otherwise spin
    # this driver loop forever — raise instead, mirroring
    # operators/labelprop.py's max_rounds contract.
    for _round in range(64):
        if live_n == 0:
            break
        # the up side must expose every node's CURRENT pointer: done
        # rows are frozen at their terminal pointer, live rows carry
        # this round's — each frame below is already checkpointed.
        up = live
        for f in done_frames:
            up = up.unionByName(f)
        up = up.select(
            F.col("node").alias("jnode"),
            F.col("anc").alias("janc"),
            F.col("depth").alias("jdepth"),
            F.col("top_branch").alias("jtb"),
        )
        if live_n <= _BCAST_FRONTIER:
            # bounded: frontier row count measured this round (<= 200k)
            adv = up.join(
                F.broadcast(live), live.anc == up.jnode, "inner"
            )
            stepped = adv.select(
                "node",
                F.col("janc").alias("anc"),
                (F.col("depth") + F.col("jdepth")).alias("depth"),
                F.coalesce("top_branch", "jtb").alias("top_branch"),
            ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
            # a frontier row with no ancestor row anywhere stopped AT
            # that ancestor — terminal with its current pointer
            # bounded: projection of the <= 200k frontier join output
            missed = live.join(
                F.broadcast(stepped.select(F.col("node").alias("__hit"))),
                live.node == F.col("__hit"),
                "left_anti",
            )
            done_frames.append(missed)
            newly_done = stepped.filter(F.col("anc") == 0)
            live = stepped.filter(F.col("anc") > 0)
        else:
            hit = F.col("jnode").isNotNull()
            stepped = live.join(up, live.anc == up.jnode, "left").select(
                "node",
                F.when(hit, F.col("janc")).otherwise(F.col("anc")).alias("anc"),
                F.when(hit, F.col("depth") + F.col("jdepth"))
                .otherwise(F.col("depth"))
                .alias("depth"),
                F.coalesce("top_branch", F.when(hit, F.col("jtb"))).alias(
                    "top_branch"
                ),
                hit.alias("__advanced"),
                # lazy checkpoint: the frontier count below materializes
                # the blocks, so each round is ONE job (see
                # operators/labelprop.py for the same pattern + rationale)
            ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
            done_frames.append(
                stepped.filter(
                    ~F.col("__advanced") | (F.col("anc") == 0)
                ).drop("__advanced")
            )
            newly_done = None
            live = stepped.filter(
                F.col("__advanced") & (F.col("anc") > 0)
            ).drop("__advanced")
        if newly_done is not None:
            done_frames.append(newly_done)
        live_n = live.count()
    else:
        raise RuntimeError(
            "sub_recursive_hierarchy: no fixpoint after 64 pointer-doubling "
            "rounds — the parent relation contains a cycle"
        )
    out = done_frames[0]
    for f in done_frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "node",
        "depth",
        F.coalesce("top_branch", F.when(F.col("anc") > 0, F.col("anc")), F.col("node"))
        .alias("top_branch"),
    ).orderBy("node")


@query(
    "analytics_attribution",
    oracle="""
    WITH w AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER back AS last_click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER back AS last_click_ts,
               first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER back AS first_click_id
        FROM events
        WINDOW back AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, last_click_id, first_click_id,
           date_diff('second', last_click_ts, ts) AS secs_since_click
    FROM w WHERE event_type = 'purchase'
    """,
    tags=("analytics", "window"),
)
def analytics_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch marketing attribution: each purchase is
    credited to the user's first and most recent preceding click (the
    current row excluded, so a simultaneous click never self-credits).
    Both carries ride ONE window sort per user — running O(1) state,
    no click-table self-join, no per-purchase subquery; the classic
    decorrelation that turns an O(purchases x clicks) lookup into one
    shuffle at any scale."""
    ev = load(spark, sf_dir, "events")
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.last(click_id, ignorenulls=True).over(back).alias("last_click_id"),
            F.last(click_ts, ignorenulls=True).over(back).alias("last_click_ts"),
            F.first(click_id, ignorenulls=True).over(back).alias("first_click_id"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "last_click_id",
            "first_click_id",
            (F.col("ts").cast("long") - F.col("last_click_ts").cast("long")).alias("secs_since_click"),
        )
    )


@query(
    "win_reset_running_sum",
    oracle="""
    WITH seg AS (
        SELECT event_id, user_id, ts, value,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS epoch
        FROM events
    )
    SELECT event_id, user_id, epoch,
           round(sum(value) OVER (PARTITION BY user_id, epoch ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM seg
    """,
    tags=("window", "custom-operator"),
)
def win_reset_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with RESET — cumulative per-user value that restarts
    at every signup event. No engine has a native 'reset' frame; the
    portable rewrite is window algebra: a running count of reset
    markers assigns each row an epoch, then the running sum partitions
    by (user, epoch). Two windows, but the second re-sorts the SAME
    (user-prefixed) ordering, so at scale this is one shuffle and two
    in-partition sorts of already-nearly-sorted runs."""
    ev = load(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    epoch = F.sum(
        F.when(F.col("event_type") == "signup", 1).otherwise(0)
    ).over(seq)
    seg = ev.select("event_id", "user_id", "ts", "value", epoch.alias("epoch"))
    run = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return seg.select(
        "event_id",
        "user_id",
        "epoch",
        F.round(F.sum("value").over(run), 2).alias("running_value"),
    )


@query(
    "ts_ohlc_bars",
    oracle="""
    WITH seq AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_open,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM events
    )
    SELECT user_id, bucket,
           round(max(CASE WHEN rn_open  = 1 THEN value END), 2) AS open,
           round(max(value), 2)                                 AS high,
           round(min(value), 2)                                 AS low,
           round(max(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
           CAST(count(*) AS BIGINT)                             AS n_ticks
    FROM seq GROUP BY user_id, bucket
    """,
    tags=("analytics", "timeseries"),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling — per (user, hour): first/max/min/last value
    in (ts, event_id) order, the candlestick rollup every tick store
    serves. Open/close ride the SAME window sort (ascending and
    descending row_number over one partitioning), then one grouped
    aggregation; engines' first()/arg_min() builtins break timestamp
    ties arbitrarily, so the explicit row_number tie-break is what
    makes the bar deterministic — on any engine, at any partitioning."""
    ev = load(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    w_open = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_close = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = ev.select(
        "user_id", bucket.alias("bucket"), "value", "ts", "event_id"
    ).select(
        "user_id",
        "bucket",
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return seq.groupBy("user_id", "bucket").agg(
        F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 2).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@query(
    "ts_seasonal_baseline",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, ts, value,
               CAST(strftime(ts, '%H') AS BIGINT) AS hr
        FROM events
    ), season AS (
        SELECT user_id, hr, round(avg(value), 4) AS seasonal
        FROM base GROUP BY user_id, hr
    )
    SELECT b.event_id, b.user_id, b.hr, s.seasonal,
           round(b.value - s.seasonal, 4) AS residual
    FROM base b JOIN season s ON b.user_id = s.user_id AND b.hr = s.hr
    """,
    tags=("analytics", "timeseries"),
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, the groupBy way: each event's value
    split into a per-(user, hour-of-day) seasonal baseline and a
    residual — the de-seasoning step before thresholding residuals
    (ts_anomaly_zscore scores raw values; scoring residuals is what
    catches a 3 a.m. spike that is normal at 3 p.m.). The baseline is
    one grouped mean over a bounded key (|users| x 24) attached back
    at event grain. Round 12 (AB_READJUD_r12 + probe): the attach is a
    WINDOW aggregate (avg over partition by (user_id, hr)) instead of
    the r6 groupBy + shuffle_hash join-back — the grouped mean and the
    join-back both needed the fact clustered on the same key, so the
    window collapses them into ONE exchange and no join at all;
    forced-evaluation A/B at 100x events: 2.6-2.8 s (agg + SHJ) ->
    1.9-2.2 s (window). The window's in-partition sort replaces the
    join build, and the r6 warning still stands one level up: an
    UNHINTED join-back plan sort-merge-sorted the whole fact side
    (11.8 s at 100x, SCALECHECK_r06) — the window shape cannot regress
    that way because there is no join left. The 4-dp round pins the
    baseline before the subtraction so the residual is engine-exact.
    r13 probe (AB_R13C_100X, measured dead end): the unhinted
    join-back under AQE — grouped baseline runtime-broadcast, zero
    fact-side exchange — LOST 2.60 -> 3.34 s median: the broadcast
    build + 6M-row hash probe costs more than the window's single
    exchange + partition sort at this tier. Window stays.
    r14 probe (AB_AUDIT100X_r14, measured dead end #3): ONE shared
    user-keyed exchange feeding both the grouped mean and a
    shuffled-hash join-back (no window sort, no second exchange) LOST
    1.74 -> 2.70 s median at 100x — the SHJ probe + the double pass
    through the exchange cost more than the window's in-partition
    sort. This closes the re-plan space (agg+join-back, broadcast
    join-back, shared-exchange SHJ all measured worse); the residual
    vs DuckDB is the single-exchange + sort floor, adjudicated
    final."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", "ts", "value", F.hour("ts").cast("long").alias("hr")
    )
    w = Window.partitionBy("user_id", "hr")
    seasonal = F.round(F.avg("value").over(w), 4)
    return base.select(
        "event_id",
        "user_id",
        "hr",
        seasonal.alias("seasonal"),
        F.round(F.col("value") - seasonal, 4).alias("residual"),
    )


@query(
    "util_file_manifest",
    oracle="""
    SELECT 'nation' AS table_name, 'nation.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows FROM nation
    UNION ALL
    SELECT 'region', 'region.parquet', CAST(count(*) AS BIGINT) FROM region
    UNION ALL
    SELECT 'supplier', 'supplier.parquet', CAST(count(*) AS BIGINT) FROM supplier
    """,
    tags=("util", "maintenance"),
)
def util_file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level lineage manifest: per input file, which table it
    feeds and how many rows it contributed — ``input_file_name()``
    grouped per file, the audit a lakehouse ingestion job emits to
    reconcile against the upstream export manifest. The oracle states
    the expected (table, file, rows) triples as ground truth by
    construction, so the check verifies Spark's scan-level lineage
    attribution (a wrong or empty input_file_name would mismatch).
    File names are basenames, so the manifest is layout-portable."""
    parts = []
    for t in ("nation", "region", "supplier"):
        df = load(spark, sf_dir, t)
        parts.append(
            df.select(
                F.lit(t).alias("table_name"),
                F.regexp_extract(F.input_file_name(), r"[^/]+$", 0).alias("file_name"),
            )
            .groupBy("table_name", "file_name")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "util_date_dim",
    oracle="""
    SELECT CAST(d AS TIMESTAMP)                              AS date_key,
           year(d)                                           AS yr,
           quarter(d)                                        AS qtr,
           month(d)                                          AS mon,
           isodow(d)                                         AS iso_dow,
           isodow(d) >= 6                                    AS is_weekend,
           CAST(date_trunc('month', d) AS TIMESTAMP)         AS month_start,
           CAST(last_day(CAST(d AS DATE)) AS TIMESTAMP)      AS month_end
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                        INTERVAL 1 DAY)) AS d)
    """,
    tags=("util", "generator"),
)
def util_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generation from nothing: one sequence()
    explode produces a dense date spine with the usual conformed
    attributes — the broadcastable dimension every date-logic join
    wants, generated JVM-side with zero input I/O (the same spine
    primitive ts_gapfill_rollup uses per key, here as a standalone
    utility). A year is 365 rows; a century is ~36.5k — always
    broadcastable, never worth persisting at any scale."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    iso_dow = F.weekday("d") + 1
    return spine.select(
        F.col("d").cast("timestamp").alias("date_key"),
        F.year("d").alias("yr"),
        F.quarter("d").alias("qtr"),
        F.month("d").alias("mon"),
        iso_dow.alias("iso_dow"),
        (iso_dow >= 6).alias("is_weekend"),
        F.date_trunc("month", F.col("d")).alias("month_start"),
        F.last_day("d").cast("timestamp").alias("month_end"),
    )


@query(
    "etl_unknown_member",
    oracle="""
    SELECT e.event_id,
           coalesce(c.c_custkey, -1)          AS cust_key,
           coalesce(c.c_mktsegment, 'UNKNOWN') AS mktsegment,
           c.c_custkey IS NULL                AS is_orphan
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("etl", "quality"),
)
def etl_unknown_member(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key repair via the unknown-member pattern: fact rows
    whose dimension key has no match are remapped to the reserved
    member (-1 / 'UNKNOWN') instead of being dropped by an inner join
    or nulled into every downstream GROUP BY — util_data_quality
    COUNTS the orphans; this is the transform that makes them
    harmless. One broadcastable dimension join; the orphan flag rides
    along for the audit trail."""
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return ev.join(c, ev.user_id == c.c_custkey, "left").select(
        "event_id",
        F.coalesce("c_custkey", F.lit(-1)).alias("cust_key"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("mktsegment"),
        F.col("c_custkey").isNull().alias("is_orphan"),
    )


@query(
    "ts_cusum",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), walk AS (
        SELECT user_id, event_id, value, rn,
               greatest(0.0, value - 5.0) AS s
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.value, o.rn,
               greatest(0.0, w.s + (o.value - 5.0))
        FROM walk w JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
    )
    SELECT user_id, event_id, round(s, 6) AS cusum FROM walk
    """,
    tags=("analytics", "timeseries", "stateful", "custom-operator"),
)
def ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic per user — the nonlinear
    recurrence S_t = max(0, S_{t-1} + (x_t - target)) every monitoring
    system runs. Unlike EWMA it needs NO Python at all: the reflected
    random walk obeys the closed form S_t = C_t - min(0, min_{j<=t}
    C_j) over the plain prefix sum C, so two frames of ONE window sort
    (running sum + running min) compute it JVM-side at any scale. The
    oracle states the recurrence itself as a recursive-CTE walk — a
    cross-formulation check, not a restatement."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_c = ev.select(
        "user_id", "ts", "event_id",
        F.sum(F.col("value") - F.lit(5.0)).over(w).alias("c"),
    )
    return with_c.select(
        "user_id",
        "event_id",
        F.round(
            F.col("c") - F.least(F.lit(0.0), F.min("c").over(w)), 6
        ).alias("cusum"),
    )


@query(
    "ts_holt_linear",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), walk AS (
        SELECT user_id, event_id, value, rn,
               CAST(value AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.value, o.rn,
               0.3 * o.value + 0.7 * (w.l + w.b),
               0.1 * ((0.3 * o.value + 0.7 * (w.l + w.b)) - w.l) + 0.9 * w.b
        FROM walk w JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
    )
    SELECT user_id, event_id, value, round(l, 6) AS level, round(b, 6) AS trend
    FROM walk
    """,
    tags=("analytics", "timeseries", "stateful", "custom-operator"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend, alpha=0.3,
    beta=0.1) per user — the coupled recurrence one step up from
    ts_ewma, run as one mapInPandas walk per key-sorted partition
    (operators/timeseries.py holt_linear; the state is a 2-vector, so
    no window rewrite exists — but the update is affine, so the
    matrix-product parallel-prefix treatment generalizes the EWMA
    segmented path if a single key ever outgrows a worker). The oracle
    states the identical recurrence as a two-accumulator recursive-CTE
    walk, making the operator exactly hash-checkable."""
    from ..operators.timeseries import holt_linear

    ev = load(spark, sf_dir, "events")
    return holt_linear(
        ev, key="user_id", ts="ts", value="value",
        alpha=0.3, beta=0.1, order_cols=("event_id",),
    )


@query(
    "join_role_playing_dates",
    oracle="""
    WITH cal AS (
        SELECT CAST(unnest(generate_series(DATE '1992-01-01', DATE '1998-12-31',
                                           INTERVAL 1 DAY)) AS TIMESTAMP) AS date_key
    ), cal2 AS (
        SELECT date_key, isodow(date_key) >= 6 AS is_weekend FROM cal
    )
    SELECT l.l_orderkey, l.l_linenumber,
           ocal.is_weekend AS ordered_on_weekend,
           scal.is_weekend AS shipped_on_weekend
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN cal2 ocal ON ocal.date_key = CAST(CAST(o.o_orderdate AS DATE) AS TIMESTAMP)
    JOIN cal2 scal ON scal.date_key = CAST(CAST(l.l_shipdate  AS DATE) AS TIMESTAMP)
    """,
    tags=("join", "analytics"),
)
def join_role_playing_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing dimension: ONE generated calendar joined twice
    under different roles (order date, ship date) — the star-schema
    pattern where a single conformed dimension serves many fact
    foreign keys via aliases instead of duplicated tables. Both roles
    broadcast the same tiny spine; the fact side is scanned once.

    The lineitem-orders equi-join carries no static join hint: the
    orders projection is a raw fact side that grows linearly with SF,
    so an unconditional shuffled-hash build is the same OOM class the
    round-8 100x tier exposed on join_multikey; the join stays
    sort-merge, which spills gracefully at every scale (10x A/B: SMJ
    2.38 s / SHJ 1.95 s — a modest win not worth a scale landmine;
    broadcast-orders 2.33 s).

    Round 10 moved both broadcast calendar joins BELOW the fact-fact
    exchange (the q12 pre-exchange projection pattern): each fact side
    resolves its date to the boolean weekend flag map-side BEFORE
    shuffling, so the big exchange carries (key, bool) instead of
    (key, timestamp) and the dates never cross the wire. Same rows —
    the calendar covers the full date domain, and an inner calendar
    join commutes with the orderkey join. Interleaved 100x A/B:
    AB_100X_r10.json (pre-exchange) vs the r9 post-exchange reading.

    Round-12 re-adjudication (AB_READJUD_r12, same-box interleaved
    Spark-vs-DuckDB): 10.7 s vs 4.9 s = 2.17x (the r11 14.4 s / 2.83x
    reading was part box). The SHJ alternative was re-probed at 100x
    and read flat-within-noise (9.1-13.1 s both ways), consistent with
    the 10x A/B above. Residual is the ROLE_PLAY_FACT_FACT constant
    (BASELINE.md): one 60M-vs-15M orderkey exchange + a 60M-row join
    output, against a single-process hash join with no exchange at
    all; both calendar roles already resolve map-side and only one
    fact-fact exchange exists to remove."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cal = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1992-01-01").cast("date"),
                    F.lit("1998-12-31").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d")
        )
        .select(
            F.col("d").cast("timestamp").alias("date_key"),
            ((F.weekday("d") + 1) >= 6).alias("is_weekend"),
        )
    )
    ocal = cal.select(
        F.col("date_key").alias("o_key"), F.col("is_weekend").alias("ordered_on_weekend")
    )
    scal = cal.select(
        F.col("date_key").alias("s_key"), F.col("is_weekend").alias("shipped_on_weekend")
    )
    o_flagged = o.join(
        # bounded: generated calendar <= 2557 rows
        F.broadcast(ocal), F.date_trunc("day", "o_orderdate") == F.col("o_key")
    ).select("o_orderkey", "ordered_on_weekend")
    li_flagged = li.join(
        # bounded: generated calendar <= 2557 rows
        F.broadcast(scal), F.date_trunc("day", "l_shipdate") == F.col("s_key")
    ).select("l_orderkey", "l_linenumber", "shipped_on_weekend")
    return li_flagged.join(
        o_flagged, li_flagged.l_orderkey == o_flagged.o_orderkey
    ).select("l_orderkey", "l_linenumber", "ordered_on_weekend", "shipped_on_weekend")


@query(
    "analytics_minmax_scale",
    oracle="""
    WITH stats AS (
        SELECT l_returnflag,
               min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           round((l.l_extendedprice - s.mn) / (s.mx - s.mn), 6) AS price_scaled
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    """,
    tags=("analytics", "ml-prep"),
)
def analytics_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling to [0, 1] — the standard ML
    normalization pass, done the scalable way: a tiny per-group stats
    aggregate broadcast-joined back, NOT a window over the fact rows
    (a global window would sort 100 TB for two scalars). The 6-dp
    round pins the division identically on both engines."""
    li = load(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    # bounded: keyed by l_returnflag, 3 rows
    return li.join(F.broadcast(stats), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(
            (F.col("l_extendedprice") - F.col("mn")) / (F.col("mx") - F.col("mn")), 6
        ).alias("price_scaled"),
    )


@query(
    "analytics_ab_welch",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(user_id % 2 AS INT)      AS variant,
               count(value)                  AS n,
               avg(value)                    AS m,
               var_samp(value)               AS v
        FROM events
        GROUP BY 1, 2
    ), wide AS (
        SELECT a.event_type,
               a.n AS n0, a.m AS m0, a.v AS v0,
               b.n AS n1, b.m AS m1, b.v AS v1
        FROM cells a JOIN cells b
          ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
    )
    SELECT event_type,
           n0, n1,
           round(m0 - m1, 4) AS mean_diff,
           round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 4) AS t_stat,
           round(pow(v0 / n0 + v1 / n1, 2)
                 / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1)),
                 2) AS welch_dof
    FROM wide
    ORDER BY event_type
    """,
    tags=("analytics", "stats"),
)
def analytics_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric Welch two-sample t-test — the workhorse readout of a
    large-scale A/B experimentation platform: users hash into variants
    (here user_id parity), and each event_type is a metric whose
    variant means are compared with the unequal-variance t statistic
    and Welch-Satterthwaite degrees of freedom.

    Scale shape: the entire test reduces to ONE map-side-combinable
    aggregation over (metric, variant) — count/mean/variance are the
    only sufficient statistics, so 100 TB of raw events collapse to
    2 rows per metric before any math happens; the t/dof arithmetic
    then runs on that tiny frame. No window, no self-join on facts —
    the cells self-join touches |metrics|x2 rows. This is why t-tests
    scale where rank-based tests (needing a global sort) struggle."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("variant"),
        "value",
    )
    cells = ev.groupBy("event_type", "variant").agg(
        F.count("value").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = cells.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n0"), F.col("m").alias("m0"), F.col("v").alias("v0"),
    )
    b = cells.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("v").alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            "n0",
            "n1",
            F.round(F.col("m0") - F.col("m1"), 4).alias("mean_diff"),
            F.round((F.col("m0") - F.col("m1")) / F.sqrt(se2), 4).alias("t_stat"),
            F.round(
                F.pow(se2, 2)
                / (
                    F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
                    + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                ),
                2,
            ).alias("welch_dof"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_autocorr",
    oracle="""
    SELECT event_type,
           round(corr(value, lv1), 4) AS ac_lag1,
           round(corr(value, lv2), 4) AS ac_lag2,
           count(lv2) AS n_pairs_lag2
    FROM (
        SELECT event_type, value,
               lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lv1,
               lag(value, 2) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lv2
        FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("ts", "stats"),
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation per metric series — the standard seasonality
    /momentum diagnostic before fitting any forecasting model (is the
    series white noise? does yesterday predict today?). Ties in ts are
    broken by event_id in BOTH engines so the lag sequence — and hence
    the statistic — is fully deterministic.

    Scale shape: one window sort per (event_type) partition produces
    both lags (shared sort, single exchange), then corr() reduces each
    series to sufficient statistics in a map-side-combinable global
    aggregation. Nothing is quadratic in the series length, and the
    per-key partition sort is exactly the layout a time-series table
    is usually already clustered in."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        "value",
        F.lag("value", 1).over(w).alias("lv1"),
        F.lag("value", 2).over(w).alias("lv2"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "lv1"), 4).alias("ac_lag1"),
            F.round(F.corr("value", "lv2"), 4).alias("ac_lag2"),
            F.count("lv2").alias("n_pairs_lag2"),
        )
        .orderBy("event_type")
    )
