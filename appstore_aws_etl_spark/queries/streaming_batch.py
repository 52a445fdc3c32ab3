"""§2.9 Streaming operators — batch-equivalent semantics checks.

Streaming *execution* can't hash-match a batch oracle, so each
streaming operator declares a batch query with identical semantics here
(hash-matched against DuckDB), while the true ``readStream`` execution
— watermarks, late data, incremental state — is implemented in
``streaming/`` and exercised by tests/test_streaming.py
(SURVEY.md §2.9, §5.2.5).

Timestamps are truncated to seconds before comparison: the fixture is
ns-precision and Spark truncates to µs (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sessionize import sessionize
from ..registry import query


@query(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           count(*)               AS n_events,
           round(sum(value), 2)   AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 tumbling window aggregation via Spark's window() — identical
    buckets to streaming `groupBy(window(ts, '1 hour'))`."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


@query(
    "stream_sliding",
    oracle="""
    WITH e AS (
        SELECT value,
               date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                        ELSE INTERVAL 0 MINUTE END AS s0
        FROM events
    ), u AS (
        SELECT value, s0 AS wstart FROM e
        UNION ALL
        SELECT value, s0 - INTERVAL 30 MINUTE AS wstart FROM e
    )
    SELECT wstart, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM u GROUP BY wstart
    """,
    tags=("streaming",),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 sliding window (1 h size, 30 min slide): every event falls in
    exactly two windows; the oracle materializes both aligned starts."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "n_events", "sum_value")
    )


@query(
    "stream_session",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('second', ts) AS ts2, event_id, value
        FROM events
    ), flagged AS (
        SELECT user_id, ts2, event_id, value,
               CASE WHEN lag(ts2) OVER w IS NULL
                         OR epoch(ts2) - epoch(lag(ts2) OVER w) > 3600
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts2, event_id)
    ), numbered AS (
        SELECT user_id, ts2, value,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts2, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           min(ts2)             AS session_start,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "custom-operator"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 session windows (1 h gap) in batch: the sessionize operator
    (gaps-and-islands) — semantics of streaming session_window."""
    ev = (
        load(spark, sf_dir, "events")
        .withColumn("ts2", F.date_trunc("second", F.col("ts")))
        .select("user_id", "ts2", "event_id", "value")
    )
    sess = sessionize(ev, key="user_id", ts="ts2", gap_seconds=3600, tie_break=["event_id"])
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts2").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, date_trunc('second', ts) AS ts2
    FROM (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY date_trunc('second', ts), event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("streaming",),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 dedup semantics: first event per (user, type) — batch twin of
    streaming dropDuplicatesWithinWatermark."""
    ev = load(spark, sf_dir, "events").withColumn("ts2", F.date_trunc("second", F.col("ts")))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts2", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts2")
    )


@query(
    "stream_enrich",
    oracle="""
    SELECT c.c_mktsegment,
           e.event_type,
           count(*)               AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
    tags=("streaming",),
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 stream-static enrichment: events joined to a static dim —
    in streaming this join runs per micro-batch with the same plan.
    The dim (customer) grows with SF, so the hint is not forced: AQE
    broadcasts it while observed-small and shuffles it at scale."""
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return (
        ev.join(c, ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "stream_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY date_trunc('second', ts), event_id) AS prev_type
        FROM events
    )
    SELECT user_id,
           count(*) FILTER (WHERE prev_type = 'view' AND event_type = 'purchase')
               AS view_to_purchase
    FROM e GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 batch analogue of the stateful per-user funnel (streaming twin
    uses applyInPandasWithState in streaming/stateful.py): count
    view->purchase transitions per user."""
    ev = load(spark, sf_dir, "events").withColumn("ts2", F.date_trunc("second", F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("ts2", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .groupBy("user_id")
        .agg(
            F.count(
                F.when(
                    (F.col("prev_type") == "view") & (F.col("event_type") == "purchase"), 1
                )
            ).alias("view_to_purchase")
        )
    )


@query(
    "stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
           date_trunc('second', p.ts) AS p_ts,
           date_trunc('second', v.ts) AS v_ts,
           round(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 stream-stream join, batch-equivalent semantics: purchases
    attributed to the same user's views in the preceding hour. The
    streaming twin (streaming/pipeline.py stream_stream_join) runs the
    identical condition with watermarks on both sides so join state
    stays bounded; true incremental execution is exercised in
    tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts_raw"),
        F.col("event_id").alias("view_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts_raw"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    cond = (
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts_raw") <= F.col("p_ts_raw"))
        & (F.col("v_ts_raw") >= F.col("p_ts_raw") - F.expr("INTERVAL 1 HOUR"))
    )
    return v.join(p, cond).select(
        "purchase_id",
        "view_id",
        "user_id",
        F.date_trunc("second", "p_ts_raw").alias("p_ts"),
        F.date_trunc("second", "v_ts_raw").alias("v_ts"),
        F.round("value", 2).alias("purchase_value"),
    )


@query(
    "stream_left_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
           date_trunc('second', p.ts) AS p_ts,
           round(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 stream-stream LEFT OUTER join, batch-equivalent semantics:
    every purchase survives, attributed views where one exists in the
    preceding hour, NULL view columns otherwise. In true streaming the
    null rows can only be emitted once the view-side watermark passes
    purchase_ts (until then a matching view may still arrive) — the
    time bound plus both watermarks is what makes the outer side
    decidable with bounded state; the batch twin states the same
    fixpoint without the wait."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts_raw"),
        F.col("event_id").alias("view_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts_raw"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    cond = (
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts_raw") <= F.col("p_ts_raw"))
        & (F.col("v_ts_raw") >= F.col("p_ts_raw") - F.expr("INTERVAL 1 HOUR"))
    )
    return p.join(v, cond, "left").select(
        "purchase_id",
        "view_id",
        "user_id",
        F.date_trunc("second", "p_ts_raw").alias("p_ts"),
        F.round("value", 2).alias("purchase_value"),
    )


@query(
    "stream_late_drop",
    oracle="""
    WITH wm AS (
        SELECT event_id, user_id, ts,
               max(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS high_water
        FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(high_water AS TIMESTAMP) AS high_water,
           high_water IS NOT NULL
               AND ts < high_water - INTERVAL 10 MINUTE AS is_late
    FROM wm
    """,
    tags=("streaming", "custom-operator", "scalable"),
)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 watermark late-drop, stated as a batch fixpoint: arrival
    order is event_id, the watermark before each arrival is the
    running max event-time STRICTLY preceding it minus the 10-minute
    delay, and an event is late iff its own time is below that mark —
    exactly the rows a ``withWatermark('ts', '10 minutes')`` stream
    drops for this arrival sequence (the true-streaming path is
    exercised in tests/test_streaming.py; this twin makes the
    semantics hash-checkable).

    Scale shape: a naive global ``max OVER (ORDER BY arrival)`` is the
    single-reducer window anti-pattern; this runs the two-phase
    range-partitioned prefix max (operators/prefix.py) — partition-
    local running max plus a broadcast of the preceding partitions'
    maxes, exact for max under any partitioning because max is
    association-free."""
    from ..operators.prefix import partitioned_prefix_max

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    marked = partitioned_prefix_max(
        ev, value="ts", order_by=["event_id"], out="high_water", strict=True
    )
    return marked.select(
        "event_id",
        "user_id",
        "ts",
        "high_water",
        (
            F.col("high_water").isNotNull()
            & (F.col("ts") < F.col("high_water") - F.expr("INTERVAL 10 MINUTES"))
        ).alias("is_late"),
    )


@query(
    "stream_sliding_topk",
    oracle="""
    WITH e AS (
        SELECT user_id,
               date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                        ELSE INTERVAL 0 MINUTE END AS s0
        FROM events
    ), u AS (
        SELECT user_id, s0 AS wstart FROM e
        UNION ALL
        SELECT user_id, s0 - INTERVAL 30 MINUTE AS wstart FROM e
    ), counts AS (
        SELECT wstart, user_id, count(*) AS n_events FROM u GROUP BY wstart, user_id
    ), ranked AS (
        SELECT wstart, user_id, n_events,
               row_number() OVER (PARTITION BY wstart
                                  ORDER BY n_events DESC, user_id) AS rk
        FROM counts
    )
    SELECT wstart, user_id, n_events, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 2
    """,
    tags=("streaming", "window"),
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window top-k (the trending-now query): the two most
    active users of every 1 h / 30 min window, deterministic tie-break
    on user_id. Batch twin of the classic streaming leaderboard — in
    true streaming this runs as the windowed count plus a per-window
    rank in the sink query; here the whole pipeline is one exact
    relation. The rank input is the (window, user) count relation —
    |windows| x |active users|, far smaller than the event stream —
    so the per-window sort never touches raw events."""
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("wstart"), "user_id", "n_events")
    )
    rk = F.row_number().over(
        Window.partitionBy("wstart").orderBy(F.col("n_events").desc(), "user_id")
    )
    return counts.withColumn("rk", rk).filter(F.col("rk") <= 2)
