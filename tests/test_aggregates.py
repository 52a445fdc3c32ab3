"""Tolerance tests for approximate aggregates (no oracle possible —
sketches are engine-specific; SURVEY.md §7.4.5)."""

from __future__ import annotations

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.10  # rsd=0.02, wide margin


def test_approx_percentile_close_to_exact(spark, sf_dir):
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
        for r in REGISTRY["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for flag, (a50, a95) in approx.items():
        e50, e95 = exact[flag]
        assert abs(a50 - e50) / e50 < 0.05
        assert abs(a95 - e95) / e95 < 0.05
