"""§2.7 Set operations (U1-U5).

unionByName is a zero-shuffle concatenation; the distinct/intersect/
except family each cost one hash-aggregate shuffle on the full row as
key. At scale, prefer pre-aggregated inputs (as these queries do) so
the shuffled row set is already small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


def _hi(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_orderkey", "o_orderstatus")
    )


def _urgent(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") < "3")
        .select("o_orderkey", "o_orderstatus")
    )


_HI_SQL = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 250000"
_URGENT_SQL = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority < '3'"


@query(
    "set_union_all",
    oracle=f"{_HI_SQL} UNION ALL {_URGENT_SQL}",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 bag concatenation by column name (overlap rows appear twice)."""
    return _hi(spark, sf_dir).unionByName(_urgent(spark, sf_dir))


@query(
    "set_union",
    oracle=f"{_HI_SQL} UNION {_URGENT_SQL}",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 set union (concat + distinct)."""
    return _hi(spark, sf_dir).unionByName(_urgent(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle=f"{_HI_SQL} INTERSECT {_URGENT_SQL}",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 set intersection (left-semi on all columns + distinct)."""
    return _hi(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@query(
    "set_except",
    oracle=f"{_HI_SQL} EXCEPT {_URGENT_SQL}",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 set difference (left-anti + distinct)."""
    return _hi(spark, sf_dir).exceptAll(_urgent(spark, sf_dir)).distinct()


@query(
    "set_bag_ops",
    oracle=f"""
    SELECT * FROM ({_HI_SQL} INTERSECT ALL {_URGENT_SQL})
    UNION ALL
    SELECT * FROM ({_HI_SQL} EXCEPT ALL {_URGENT_SQL})
    """,
    tags=("setop",),
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 bag-semantics intersect/except, combined into one result so a
    single key covers both variants."""
    hi, urgent = _hi(spark, sf_dir), _urgent(spark, sf_dir)
    return hi.intersectAll(urgent).unionByName(hi.exceptAll(urgent))


@query(
    "set_union_by_name",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NULL AS DOUBLE) AS c_acctbal, 'v1' AS schema_ver
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, 'v2' AS schema_ver
    FROM customer WHERE c_custkey % 2 = 1
    """,
    tags=("setop", "schema-evolution"),
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: a v1 extract (no balance column) and a
    v2 extract (balance added) combined by COLUMN NAME with the missing
    column null-filled — ``unionByName(allowMissingColumns=True)``, the
    append path every long-lived 100 TB table needs when producers add
    fields (positional UNION would silently misalign columns instead).
    """
    c = load(spark, sf_dir, "customer")
    v1 = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_mktsegment", F.lit("v1").alias("schema_ver")
    )
    v2 = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_mktsegment", "c_acctbal", F.lit("v2").alias("schema_ver")
    )
    return v1.unionByName(v2, allowMissingColumns=True)
