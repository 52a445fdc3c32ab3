"""Sinks (SURVEY.md §2.1 S8-S9).

The serving layer of the declared pipeline (reference README.md:2:
"load a Redshift database"). Spark-native form: partitioned parquet
lakehouse tables as the primary serving layer, JDBC for warehouse
loads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """S8 partitioned parquet sink.

    ``partitionBy`` columns become directory partitions => downstream
    scans get partition pruning for free. ``maxRecordsPerFile`` bounds
    file sizes at 100 TB so no single task writes an unbounded file.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
    mode: str = "append",
    num_partitions: int | None = None,
) -> None:
    """S9 JDBC warehouse sink (Redshift-style serving load).

    Credentials belong in ``options`` resolved *outside* the plan —
    the Spark-native replacement for the reference's Secrets Manager
    lookup (secrets.py:41-46); they are never shipped as columns.
    For Redshift at scale, prefer write_parquet to object storage
    followed by the warehouse's bulk COPY, which this function's
    ``num_partitions`` staging mirrors.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    writer.mode(mode).save()
