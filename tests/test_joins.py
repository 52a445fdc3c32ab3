from __future__ import annotations

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY

from appstore_aws_etl_spark.plans import formatted_plan


def test_broadcast_join_goes_broadcast(spark, sf_dir):
    plan = formatted_plan(REGISTRY["join_broadcast"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_semi_anti_partition(spark, sf_dir):
    semi = REGISTRY["join_semi"].fn(spark, sf_dir)
    anti = REGISTRY["join_anti"].fn(spark, sf_dir)
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # semi + anti partition the customer table exactly
    assert semi.count() + anti.count() == customers.count()


def test_full_outer_covers_both_sides(spark, sf_dir):
    full = REGISTRY["join_full"].fn(spark, sf_dir)
    rows = full.collect()
    assert any(r["building_cust"] is None for r in rows)
    assert any(r["big_spender_cust"] is None for r in rows)
