"""§2.1 Scans (S5 parquet, S6 CSV/TSV, S7 JSON).

The reference's ingest model is App-Store-style exports: gzipped TSV
sales reports and JSON analytics payloads landed as opaque objects
(SURVEY.md §1.1, reference utils/utils/s3.py:26-30). Here each format
is read with an *explicit schema* — inference is a second full pass
over the data and is banned in production paths.

The CSV/JSON queries materialize a deterministic export of a fixture
table into a local cache dir, read it back through the format reader,
and oracle against the original parquet — proving a lossless
ingest round-trip.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..catalog import load
from ..registry import query

CACHE_DIR = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/appstore_etl_cache")


@query(
    "scan_parquet",
    oracle="SELECT * FROM nation",
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 typed columnar scan."""
    return load(spark, sf_dir, "nation")


@query(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 gzipped TSV ingest (App Store sales-report shape) with an
    explicit schema; round-trips ``nation`` through csv.gz."""
    path = os.path.join(CACHE_DIR, "scan_csv", os.path.basename(sf_dir.rstrip("/")))
    (
        load(spark, sf_dir, "nation")
        .coalesce(1)
        .write.mode("overwrite")
        .options(sep="\t", header=True, compression="gzip")
        .csv(path)
    )
    return (
        spark.read.schema(schemas.NATION)
        .options(sep="\t", header=True)
        .csv(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "scan_json",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 JSON-lines ingest (API payload shape) with explicit schema."""
    path = os.path.join(CACHE_DIR, "scan_json", os.path.basename(sf_dir.rstrip("/")))
    load(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").json(path)
    return (
        spark.read.schema(schemas.NATION)
        .json(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "scan_orc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingest round-trip (the other columnar format warehouses
    exchange); native vectorized reader, schema carried by the file."""
    path = os.path.join(CACHE_DIR, "scan_orc", os.path.basename(sf_dir.rstrip("/")))
    load(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").orc(path)
    return spark.read.orc(path).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(3 AS BIGINT)        AS n_corrupt
    FROM nation
    """,
    tags=("scan", "error-handling"),
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 ingest under dirty input: the nation TSV plus a file of three
    deterministically malformed lines (wrong arity, unparseable key),
    read in PERMISSIVE mode — the production contract for 100 TB of
    third-party exports is that bad lines become null-keyed rows that
    route to quarantine, never a failed stage. The malformed rows are
    injected by construction, so the oracle states the good/corrupt
    split as ground truth (nation has no null keys, so a null key IS
    the corruption marker)."""
    path = os.path.join(
        CACHE_DIR, "scan_csv_malformed", os.path.basename(sf_dir.rstrip("/"))
    )
    (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1)
        .write.mode("overwrite")
        .options(sep="\t", header=False)
        .csv(path)
    )
    bad = os.path.join(path, "part-99999-malformed.csv")
    with open(bad, "w") as fh:
        fh.write("###garbage###\nnot\tan-int\nonly-one-field\n")
    df = (
        spark.read.schema("n_nationkey bigint, n_name string, n_regionkey bigint")
        .options(sep="\t", header=False, mode="PERMISSIVE")
        .csv(path)
    )
    return df.agg(
        F.count(F.when(F.col("n_nationkey").isNotNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("n_nationkey").isNull(), 1)).alias("n_corrupt"),
    )


@query(
    "scan_xml",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest round-trip (the remaining third-party export format
    warehouses still receive — feeds, invoices, legacy B2B payloads),
    via Spark 4's NATIVE XML source (built-in since 4.0; no external
    package): explicit rowTag on both sides, explicit schema on read —
    the same no-inference production contract as the CSV/JSON scans.
    Oracled against the original parquet, proving losslessness."""
    path = os.path.join(CACHE_DIR, "scan_xml", os.path.basename(sf_dir.rstrip("/")))
    (
        load(spark, sf_dir, "nation")
        .coalesce(1)
        .write.mode("overwrite")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .xml(path)
    )
    return (
        spark.read.schema(schemas.NATION)
        .option("rowTag", "nation")
        .xml(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )
