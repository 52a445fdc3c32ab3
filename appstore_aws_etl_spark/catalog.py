"""Table loading and view registration.

One parquet file per table per scale-factor directory (TESTDATA.md). At
100 TB each "table" is a partitioned parquet dataset directory instead of
a single file — the loader accepts either (Spark's file source handles
both transparently, with partition discovery and pruning on directories).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_NAMES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Typed columnar scan of one table (SURVEY.md §2.1 S5).

    Parquet carries its own schema; Catalyst prunes columns and pushes
    predicates into the scan (verified by plan-shape tests).

    ``events.ts`` has shipped in two fixture generations: nanosecond
    ints (Spark 4 rejects nanos outright, [PARQUET_TYPEILLEGAL], so
    they are read as raw longs via the legacy conf and truncated to µs
    with exact integer division) and plain TIMESTAMP_NTZ micros. The
    loader inspects the parquet-declared type and normalizes either
    shape to session-timezone ``timestamp`` (UTC), so every downstream
    operator sees one stable schema. SURVEY.md §7.4.3: oracle
    comparisons bucket to >= second granularity anyway.
    """
    # timestamps must compare UTC-naive against the DuckDB oracle no
    # matter what session the caller provides (runtime conf, safe to
    # set repeatedly)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampType

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif not isinstance(ts_type, TimestampType):
            # TIMESTAMP_NTZ (or anything else castable): with a UTC
            # session the naive wall-clock maps 1:1 onto instants.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so queries can be expressed in Spark SQL."""
    for name in names or TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
