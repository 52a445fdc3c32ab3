"""Streaming sources, windowed transforms, and execution helpers.

Design notes for scale (SURVEY.md §2.9):

* Watermarks bound state: every aggregation here carries
  ``withWatermark`` so the state store evicts windows/keys older than
  the lateness budget — without it, 100 TB/day of events grows state
  forever.
* File sources process incrementally (``maxFilesPerTrigger``) and a
  production deployment swaps in Kafka by changing only
  ``stream_events`` — every transform below is source-agnostic.
* ``trigger(availableNow=True)`` drains the backlog with bounded
  memory and stops — the pattern both tests and backfills use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS


def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """T8/S10 file-source event stream with the explicit EVENTS schema
    (streams must declare schemas — inference would race the writer)."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def tumbling_counts(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """T1+T4 watermarked tumbling-window aggregation."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """T2 watermarked sliding-window aggregation (1 h / 30 min)."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "n_events", "sum_value")
    )


def session_counts(events: DataFrame, gap: str = "1 hour", lateness: str = "10 minutes") -> DataFrame:
    """T3 native streaming session windows (gap-merged state)."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


def stream_dedup(events: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """T5 drop duplicate event_ids; watermark bounds the dedup state to
    the lateness horizon (exactly-once within it)."""
    return events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(["event_id"])


def stream_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """T6 stream-static join: the static side is re-planned per
    micro-batch; no streaming state involved. No forced broadcast —
    the dim passed here (customer) grows with SF, and Catalyst/AQE
    broadcasts it per micro-batch only while it is observed-small."""
    return events.join(
        dim, events.user_id == dim.c_custkey, "inner"
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_mktsegment")


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint: str | None = None,
) -> DataFrame:
    """T8 drain the stream with availableNow into an in-memory table;
    returns the batch DataFrame of results (test/backfill harness).

    One-shot only: Spark's memory sink cannot recover from an existing
    checkpoint, so a second call reusing the same ``checkpoint`` dir
    throws. For checkpointed incremental draining (process only
    newly-arrived files with carried-over watermark/state) use
    ``run_collecting`` — its foreachBatch sink supports recovery.
    """
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def run_collecting(
    stream_df: DataFrame,
    checkpoint: str,
    output_mode: str = "append",
) -> list:
    """T8 foreachBatch sink draining with availableNow, returning every
    emitted row. Unlike the memory sink, foreachBatch supports
    checkpoint recovery, so successive calls with the same checkpoint
    process only newly-arrived data — the incremental-backfill pattern.
    """
    collected: list = []

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        collected.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def stream_stream_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    lateness: str = "10 minutes",
) -> DataFrame:
    """T9 stream-stream inner join: each purchase attributed to the
    same user's prior view within ``horizon``.

    Both inputs carry watermarks AND the join condition bounds the
    event-time distance — that pair is what lets the state store evict
    buffered rows once the watermark passes view_ts + horizon. A
    stream-stream join without the time bound buffers both streams
    forever; at 100 TB/day that is the difference between bounded state
    and an OOM'd cluster."""
    v = views.withWatermark("ts", lateness).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", lateness).select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    cond = (
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond).select(
        "purchase_id", "view_id", "user_id", "p_ts", "v_ts", "value"
    )


def stream_stream_left_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    lateness: str = "10 minutes",
) -> DataFrame:
    """T9 stream-stream LEFT OUTER join: every purchase is preserved;
    the view columns are NULL when no same-user view precedes it
    within ``horizon``.

    Outer stream-stream joins have a harder requirement than inner:
    a NULL row for a purchase can only be emitted once the view-side
    watermark has passed purchase_ts — before that, a matching view
    may still arrive. Spark enforces this with the same two
    ingredients (watermarks on both inputs + an event-time bound in
    the condition); rows buffered at query stop never get their NULL
    emission, which is correct streaming semantics, not data loss."""
    v = views.withWatermark("ts", lateness).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", lateness).select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    cond = (
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(v, cond, "leftOuter").select(
        "purchase_id", "view_id", "user_id", "p_ts", "value"
    )
