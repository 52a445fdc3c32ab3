"""Scale-mechanism tests: the machinery that matters at 100 TB —
bucketed shuffle-free joins, partitioned sinks with partition pruning,
salted skew joins, config resolution — verified on small data by
asserting plan shape and result equivalence."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from appstore_aws_etl_spark.io.bucketing import bucketed_join, write_bucketed
from appstore_aws_etl_spark.io.config import get_secret, jdbc_options_from_secret
from appstore_aws_etl_spark.io.sinks import write_parquet
from appstore_aws_etl_spark.operators.skew import salted_join
from appstore_aws_etl_spark.plans import formatted_plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # bucket metadata needs catalog tables; the (static) warehouse dir
    # defaults to ./spark-warehouse — tables are dropped on the way out
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", num_buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", num_buckets=8)
    # broadcast would bypass bucketing on this tiny data — force SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", on="o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of bucketing
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    write_parquet(orders, out, partition_by=["order_year"])
    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = formatted_plan(back)
    # static partition pruning: only the 1997 directory is scanned
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == orders.filter(F.col("order_year") == 1997).count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    salted = salted_join(lineitem, orders, on="o_orderkey", salt_buckets=4)
    plain = lineitem.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    s = salted.agg(F.round(F.sum("l_quantity"), 2).alias("q")).collect()[0]["q"]
    p = plain.agg(F.round(F.sum("l_quantity"), 2).alias("q")).collect()[0]["q"]
    assert s == p


def test_secret_resolution_env_and_file(tmp_path, monkeypatch):
    monkeypatch.setenv("APPSTORE_ETL_SECRET_WAREHOUSE_MAIN", '{"username": "u", "password": "p"}')
    sec = get_secret("warehouse/main")
    assert jdbc_options_from_secret(sec)["user"] == "u"

    (tmp_path / "apikey.json").write_text(json.dumps({"token": "t"}))
    assert get_secret("apikey", secrets_dir=str(tmp_path))["token"] == "t"

    plain = tmp_path / "raw.json"
    plain.write_text("not-json")
    assert get_secret("raw", secrets_dir=str(tmp_path), string_format="PLAIN TEXT") == "not-json"

    with pytest.raises(ValueError):
        get_secret("raw", secrets_dir=str(tmp_path), string_format="XML")
    # unresolvable secret: RuntimeError without boto3, a botocore
    # credential/endpoint error with it — either way it must raise
    with pytest.raises(Exception):
        get_secret("missing-secret-name")
