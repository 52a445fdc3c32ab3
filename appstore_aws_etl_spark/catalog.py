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


# Per-session DataFrame memo: fixture tables are immutable, DataFrames
# are immutable plan handles, and a 248-key sweep otherwise re-runs
# file listing + parquet footer analysis ~500 times for the same ten
# tables. Keyed by applicationId so a new session never sees a stale
# handle; bounded at (sessions x sf_dirs x 10 tables) driver objects.
_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Typed columnar scan of one table (SURVEY.md §2.1 S5).

    Parquet carries its own schema; Catalyst prunes columns and pushes
    predicates into the scan (verified by plan-shape tests).

    The fixture's timestamp columns have shipped in several parquet
    generations: ``events.ts`` as nanosecond ints (Spark 4 rejects
    nanos outright, [PARQUET_TYPEILLEGAL], so they are read as raw
    longs via the legacy conf and truncated to µs with exact integer
    division) and, since the round-3 regeneration, TIMESTAMP_NTZ
    micros for EVERY timestamp column (events.ts, orders.o_orderdate,
    lineitem.l_shipdate). The loader inspects the parquet-declared
    types and normalizes every NTZ column — in any table — to
    session-timezone ``timestamp`` (UTC; the naive wall-clock maps 1:1
    onto instants), so every downstream operator sees one stable
    schema and literal comparisons like ``l_shipdate >= timestamp
    '1997-01-01'`` never depend on implicit NTZ-vs-LTZ coercion.
    SURVEY.md §7.4.3: oracle comparisons bucket to >= second
    granularity anyway.
    """
    # timestamps must compare UTC-naive against the DuckDB oracle no
    # matter what session the caller provides (runtime conf, safe to
    # set repeatedly)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    memo_key = (
        spark.sparkContext.applicationId, os.path.abspath(sf_dir), name
    )
    hit = _DF_MEMO.get(memo_key)
    if hit is not None:
        return hit
    df = _load_uncached(spark, sf_dir, name)
    _DF_MEMO[memo_key] = df
    return df


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql.types import LongType

        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        df = _normalize_ntz(df)
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return _normalize_ntz(spark.read.parquet(table_path(sf_dir, name)))


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-timezone timestamp.

    Column-pruning note: the cast is a projection over the scan, so
    Catalyst still prunes unreferenced columns and pushes comparison
    predicates through it (plan-shape tests assert PushedFilters
    survive)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# current view target per (applicationId, view name) -> sf_dir, so a
# repeat registration for the SAME data is a no-op but switching the
# session to another scale factor still re-points every view
_VIEW_STATE: dict[tuple[str, str], str] = {}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so queries can be expressed in Spark SQL."""
    app = spark.sparkContext.applicationId
    target = os.path.abspath(sf_dir)
    for name in names or TABLE_NAMES:
        if _VIEW_STATE.get((app, name)) == target:
            continue
        load(spark, sf_dir, name).createOrReplaceTempView(name)
        _VIEW_STATE[(app, name)] = target
