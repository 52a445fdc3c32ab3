"""§2.6 Sorts / limits / top-k (O1-O3).

Spark's total sort is a range-partitioned sort (sampled boundaries ->
exchange -> per-partition sort); ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject, which keeps only k rows per partition and merges
on the driver — O(k) memory, never a full sort, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus DESC NULLS LAST, o_totalprice ASC, o_orderkey
    """,
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 multi-key total sort, mixed direction, explicit null placement.

    The driver's value-hash is order-insensitive, so the check verifies
    the row *set*; ordering itself is asserted in tests/test_sorts.py.
    """
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").desc_nulls_last(),
            F.col("o_totalprice").asc(),
            F.col("o_orderkey"),
        )
    )


@query(
    "sort_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
    tags=("sort",),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 limit after a sort on a unique key (deterministic row set —
    a bare limit without order would not be, SURVEY.md §7.4.2)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort",),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 global top-k (TakeOrderedAndProject), unique tie-break key."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )
