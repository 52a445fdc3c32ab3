"""§2.5 Window functions (W1-W9).

A window op costs one shuffle on the partition key + one in-partition
sort; stacked windows over the same (partition, order) spec reuse the
sort. Determinism: every ORDER BY ends in unique key columns
(SURVEY.md §7.4.2) except where peers are semantically equivalent
(rank ties, range frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# canonical deterministic per-group ordering for lineitem (lazy: Column
# construction needs an active SparkContext)
def _li_order():
    return [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")]


_LI_ORDER_SQL = "l_extendedprice DESC, l_orderkey, l_linenumber"


@query(
    "win_row_number",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY {_LI_ORDER_SQL}) AS rn
    FROM lineitem
    """,
    tags=("window",),
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 unique sequence per partition."""
    w = Window.partitionBy("l_returnflag").orderBy(*_li_order())
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn")
    )


@query(
    "win_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk
    FROM lineitem
    """,
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 rank/dense_rank — tie groups share a rank, so value-ordering
    alone is deterministic."""
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_ntile",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ntile(4) OVER (PARTITION BY l_returnflag ORDER BY {_LI_ORDER_SQL}) AS quartile
    FROM lineitem
    """,
    tags=("window",),
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 n-tile bucketing over a unique ordering."""
    w = Window.partitionBy("l_returnflag").orderBy(*_li_order())
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "win_pct",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           round(percent_rank() OVER (PARTITION BY l_returnflag ORDER BY {_LI_ORDER_SQL}), 6) AS pct_rnk,
           round(cume_dist()    OVER (PARTITION BY l_returnflag ORDER BY {_LI_ORDER_SQL}), 6) AS cume
    FROM lineitem
    """,
    tags=("window",),
)
def win_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 relative-rank statistics."""
    w = Window.partitionBy("l_returnflag").orderBy(*_li_order())
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 6).alias("pct_rnk"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
           lag(o_totalprice, 2, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev2_price
    FROM orders
    """,
    tags=("window",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 lag/lead with offset and default."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 running total (cumulative frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
    FROM orders
    """,
    tags=("window",),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 sliding rows-frame moving average."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("avg3"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey,
           count(*) OVER (
               ORDER BY o_orderkey
               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS n_near,
           round(sum(o_totalprice) OVER (
               ORDER BY o_orderkey
               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 2) AS sum_near
    FROM orders
    """,
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 value-range frame: all rows whose key is within 10 of the
    current row's key (peer-inclusive, so tie order is irrelevant)."""
    w = Window.orderBy("o_orderkey").rangeBetween(-10, Window.currentRow)
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_near"),
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           nth_value(l_extendedprice, 2) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
    FROM lineitem
    """,
    tags=("window",),
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9-adjacent nth_value over a full-partition frame."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           first_value(l_extendedprice) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
           last_value(l_extendedprice) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM lineitem
    """,
    tags=("window",),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 frame-edge values with an explicit full-partition frame (the
    default frame would make last_value just the current row)."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
    )


@query(
    "win_scalable_cumsum",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(sum(o_totalprice) OVER (
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum
    FROM orders
    """,
    tags=("window", "custom-operator", "scale"),
)
def win_scalable_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running total WITHOUT the single-partition global window:
    two-phase range-partitioned prefix sum (operators/prefix.py) —
    partition-local cumsums plus broadcast per-partition offsets. The
    oracle states the naive global window; results agree because
    o_totalprice is a 2dp money value, so every true prefix lies on the
    2dp grid and rounding there is association-order-proof."""
    from ..operators.prefix import partitioned_prefix_sum

    o = load(spark, sf_dir, "orders")
    out = partitioned_prefix_sum(
        o, value="o_totalprice", order_by=["o_orderdate", "o_orderkey"], out="cum"
    )
    return out.select("o_orderkey", "o_totalprice", F.round("cum", 2).alias("cum"))


@query(
    "win_moving_median",
    oracle="""
    SELECT event_id, user_id,
           round(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW), 4) AS med25
    FROM events
    """,
    tags=("window", "stats"),
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a trailing 25-row frame — robust smoothing
    for noisy series. Spark disallows median() over a framed window, so
    the frame is materialized JVM-side (collect_list over the row
    frame, array_sort, midpoint interpolation) — bounded at 25 elements
    per row, still whole-stage-codegen, no Python. Exact interpolated
    median on both engines: no accumulation-order noise."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, Window.currentRow)
    )
    ev = load(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    return ev.select(
        "event_id", "user_id", F.round((lo + hi) / 2, 4).alias("med25")
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_trailing_hour,
           round(sum(value) OVER w, 2) AS sum_trailing_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts)
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("window", "timeseries"),
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, aggregates over the trailing
    one hour of events — the window-function twin of a sliding stream
    window. Spark's rangeBetween needs a numeric ordering key, so the
    timestamp becomes epoch seconds and the frame is [-3600, 0]; the
    oracle orders by the second-truncated timestamp so both engines
    evaluate the identical boundary (unix_timestamp floors to the
    second — sub-second ordering would make hour-boundary membership
    engine-dependent). RANGE semantics include peers, making tie order
    irrelevant on both engines.

    Scale shape: one shuffle on user_id (the partition key) and a sort
    within partitions — unlike a global ORDER BY window there is no
    single-task bottleneck; each user's frame state is a bounded
    sliding buffer."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing_hour"),
    ).orderBy("event_id")


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) = 1 AS first_seen
        FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(CASE WHEN first_seen THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
    tags=("window", "custom-operator"),
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — 'how many distinct event types has
    this user produced so far' at every event. No engine supports
    DISTINCT inside a window frame; the portable rewrite flags each
    (user, type)'s first occurrence with one row_number, then running-
    sums the flags — two windows over compatible partitionings, state
    O(1) per frame, versus the naive per-row set accumulation that
    needs unbounded memory."""
    ev = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ev.select(
        "user_id", "ts", "event_id",
        (F.row_number().over(w_first) == 1).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum(F.when(F.col("first_seen"), 1).otherwise(0))
        .over(w_run)
        .cast("long")
        .alias("distinct_types_so_far"),
    )
