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
    """
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so queries can be expressed in Spark SQL."""
    for name in names or TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
