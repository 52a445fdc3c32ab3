"""App-Store-style sales-report ETL, end to end.

The reference declares (README.md:2) but never implements this
pipeline; here it is Spark-native:

1. **Extract/land** — gzipped TSV report objects arrive in a landing
   zone keyed by report date (the App Store Connect export shape).
2. **Ingest** — read with an explicit schema (never inferred), bad
   lines quarantined via PERMISSIVE mode + corrupt-record column.
3. **Transform** — typed frame -> daily per-status revenue rollup.
4. **Load** — partitioned parquet serving table (the lakehouse
   equivalent of the Redshift COPY; io.sinks.write_jdbc is the direct
   warehouse edge when a JDBC endpoint exists).

Each stage is a function so tests (and operators) can exercise them
independently; `run_sales_pipeline` chains them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io.landing import LandingZone
from ..io.sinks import write_parquet

SALES_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("report_date", T.StringType(), False),
        T.StructField("order_id", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("units", T.IntegerType(), False),
        T.StructField("proceeds", T.DoubleType(), False),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def land_reports(zone: LandingZone, reports: dict[str, bytes]) -> list[str]:
    """Stage 1: write raw gzipped TSV payloads under date-keyed paths
    (reference BucketPath.store parity, s3.py:26-30)."""
    return [zone.store(body, f"reports/{date}/sales.tsv.gz") for date, body in reports.items()]


def ingest_reports(spark: SparkSession, zone: LandingZone) -> DataFrame:
    """Stage 2: schema-declared TSV ingest straight off the landing
    zone; malformed rows land in _corrupt_record instead of failing the
    job (at 100 TB a single bad export must not kill the run)."""
    base = os.path.join(zone.root, zone.prefix, "reports") if zone.prefix else os.path.join(
        zone.root, "reports"
    )
    return (
        spark.read.schema(SALES_REPORT_SCHEMA)
        .options(
            sep="\t",
            header=True,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record",
            recursiveFileLookup=True,  # reports land under date-keyed subdirs
        )
        .csv(base)
    )


def transform_daily_revenue(reports: DataFrame) -> DataFrame:
    """Stage 3: clean + typed rollup: daily revenue/units by status."""
    clean = reports.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return (
        clean.withColumn("report_day", F.to_date("report_date", "yyyy-MM-dd"))
        .groupBy("report_day", "status")
        .agg(
            F.sum("units").alias("units"),
            F.round(F.sum("proceeds"), 2).alias("proceeds"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def run_sales_pipeline(
    spark: SparkSession,
    zone: LandingZone,
    serving_path: str,
) -> DataFrame:
    """Stages 2-4 chained: ingest -> transform -> partitioned serving
    table. Returns the serving DataFrame (read back from the sink, so
    callers observe exactly what consumers will)."""
    rollup = transform_daily_revenue(ingest_reports(spark, zone))
    write_parquet(rollup, serving_path, partition_by=["report_day"])
    return spark.read.parquet(serving_path)
