"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4.1).

Bucketing pre-shuffles a table once at write time (``bucketBy`` on the
join key); two tables bucketed the same way then sort-merge join with
**zero exchanges** — at 100 TB this converts every recurring
fact-to-fact join on the bucket key from the dominant shuffle into a
local merge. The cost is paid once per write instead of once per query.

Spark requires a catalog table (``saveAsTable``) for bucket metadata;
plain parquet paths can't carry it.

Round-13 deployment knobs, both measured at the 100x tier
(AB_BUCKETED100X_r13*.json, BASELINE.md round-13 section):

* ``catalog.BUCKETED_OVERRIDES`` maps logical table names to bucketed
  catalog tables, so every registry query transparently reads the
  bucketed layout — orderkey-bucketed orders/lineitem remove 30-70% of
  the floor keys' wall time and ALL orderkey exchanges.
* ``spark.sql.requireAllClusterKeysForCoPartition=false`` lets a join
  on a SUPERSET of the bucket key (join_multikey's (orderkey,
  linenumber)) reuse single-key bucketing — HashPartitioning(orderkey)
  legitimately satisfies the pair clustering, Spark just refuses by
  default to avoid subset-key skew. With it, join_multikey runs with
  zero exchanges (9.85 -> 3.02 s). Set per-session where bucket keys
  are known non-degenerate; not a repo default (the skew caution is
  real for ad-hoc data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables — Catalyst elides both
    exchanges (asserted in tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
