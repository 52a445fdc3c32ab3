"""Property-based spot checks (SURVEY.md §5.2.6): algebraic identities
that must hold for any data — run over hypothesis-generated literal
frames (bounded sizes: each example pays Spark job overhead)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key (collisions likely)
        st.integers(min_value=-1000, max_value=1000),   # value
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=rows)
@settings(**_SETTINGS)
def test_count_splits_by_filter(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    pred = F.col("v") > 0
    assert df.filter(pred).count() + df.filter(~pred).count() == df.count()


@given(data=rows)
@settings(**_SETTINGS)
def test_groupby_sum_equals_global_sum(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    grouped = df.groupBy("k").agg(F.sum("v").alias("s"))
    total_grouped = grouped.agg(F.sum("s").alias("t")).collect()[0]["t"]
    total = df.agg(F.sum("v").alias("t")).collect()[0]["t"]
    assert total_grouped == total


@given(data=rows)
@settings(**_SETTINGS)
def test_distinct_plus_dups_partition_rows(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    n_distinct = df.distinct().count()
    dup_count = (
        df.groupBy("k", "v").agg((F.count(F.lit(1)) - 1).alias("extra"))
        .agg(F.sum("extra").alias("d")).collect()[0]["d"]
    )
    assert n_distinct + dup_count == df.count()


@given(data=rows)
@settings(**_SETTINGS)
def test_semi_anti_partition_left(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    right = df.filter(F.col("v") % 2 == 0).select("k").distinct()
    semi = df.join(right, "k", "left_semi").count()
    anti = df.join(right, "k", "left_anti").count()
    assert semi + anti == df.count()
