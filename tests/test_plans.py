"""Plan-shape assertions (SURVEY.md §4.1): the declarative API must
actually produce pushed filters, pruned scans, and partial aggregation.
These are the properties that make the plans survive a 100x scale-up.
"""

from __future__ import annotations

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.plans import formatted_plan
from appstore_aws_etl_spark.registry import REGISTRY


def test_filter_pushdown(spark, sf_dir):
    df = REGISTRY["filter_compare"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan


def test_column_pruning(spark, sf_dir):
    df = REGISTRY["project_select"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # ReadSchema carries only the selected columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_shipdate" not in read_schema


def test_partial_aggregation(spark, sf_dir):
    df = REGISTRY["agg_group"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # partial (map-side) + final hash aggregate around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    df = REGISTRY["sort_topk"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
