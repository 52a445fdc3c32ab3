from __future__ import annotations

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY


def test_flagship_runs_and_groups(spark, sf_dir):
    df = REGISTRY["agg_group"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 6  # 3 returnflags x 2 linestatuses
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols
    total = sum(r["count_order"] for r in rows)
    assert total > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
