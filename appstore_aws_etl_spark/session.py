"""SparkSession factory.

Defaults are chosen for correctness-at-scale first (AQE on, skew-join
handling on, sane shuffle partitioning), then tuned for the local[N]
test harness. On a real cluster the same builder applies — only
``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "appstore_aws_etl_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    AQE is always on: at 100 TB it coalesces post-shuffle partitions,
    splits skewed joins, and re-plans sort-merge -> broadcast when runtime
    stats allow. ``spark.sql.shuffle.partitions`` is set to a small
    multiple of cores locally; on a cluster AQE's coalescing makes the
    initial number non-critical as long as it's high enough.
    """
    n = default_parallelism()
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", n))
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
