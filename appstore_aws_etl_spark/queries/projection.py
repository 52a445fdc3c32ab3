"""§2.2 Projection / filter / predicates (P1-P11).

All pure built-ins: every predicate here is pushed into the parquet
scan by Catalyst (PushedFilters), and every select prunes the read
schema — verified by tests/test_plans.py. At 100 TB these queries read
only the row groups and columns they need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "project_select",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    tags=("projection",),
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 column pruning: scan reads exactly three columns."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "project_alias",
    oracle="""
    SELECT l_orderkey AS order_key, l_linenumber AS line_no, l_quantity AS qty
    FROM lineitem
    """,
    tags=("projection",),
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 rename/alias for a serving schema."""
    return load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").alias("qty"),
    )


@query(
    "project_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
    tags=("projection",),
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 derived expression column.

    Rounded at 4 dp — the precision where price(2dp) x discount(2dp)
    is decimally exact, so Spark's HALF_UP string rounding and DuckDB's
    value rounding agree (2 dp would diverge on exact .xx5 halves,
    SURVEY.md §7.4.1).
    """
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


@query(
    "project_cast",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_linenumber AS VARCHAR)          AS line_str,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_day
    FROM lineitem
    """,
    tags=("projection",),
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 explicit casts.

    Conventions pinned (SURVEY.md §7.4.4): double->int is *truncation
    toward zero* (Spark's cast) — the oracle spells it ``trunc`` because
    DuckDB's numeric cast rounds instead; day-granularity values are
    served as midnight timestamps (cast through DATE) because DATE
    objects round-trip differently through pandas in the two engines.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_day"),
    )


@query(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 30
    """,
    tags=("filter",),
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 comparison predicate, pushed to the scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "filter_boolean",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity > 45 AND (l_returnflag = 'R' OR NOT l_linestatus = 'F')
    """,
    tags=("filter",),
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 AND / OR / NOT combinators."""
    li = load(spark, sf_dir, "lineitem")
    cond = (F.col("l_quantity") > 45) & (
        (F.col("l_returnflag") == "R") | (~(F.col("l_linestatus") == "F"))
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@query(
    "filter_in",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem WHERE l_returnflag IN ('A', 'R') AND l_quantity < 3
    """,
    tags=("filter",),
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 IN-list membership."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isin("A", "R") & (F.col("l_quantity") < 3))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


@query(
    "filter_between",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 150000
    """,
    tags=("filter",),
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 BETWEEN range predicate."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").between(100000, 150000))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_type FROM part WHERE p_type LIKE 'PROMO%'
    """,
    tags=("filter",),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 LIKE prefix pattern (becomes a StartsWith pushed filter)."""
    return load(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%")).select(
        "p_partkey", "p_type"
    )


@query(
    "filter_null",
    oracle="""
    SELECT l_orderkey, l_linenumber, nullif(l_discount, 0) AS disc_or_null
    FROM lineitem
    WHERE nullif(l_discount, 0) IS NULL AND l_tax IS NOT NULL AND l_linenumber <= 2
    """,
    tags=("filter",),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 IS NULL / IS NOT NULL (fixtures are null-free, so nulls are
    manufactured with ``nullif`` to make the predicate discriminating)."""
    li = load(spark, sf_dir, "lineitem")
    disc_or_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        li.withColumn("disc_or_null", disc_or_null)
        .filter(
            F.col("disc_or_null").isNull()
            & F.col("l_tax").isNotNull()
            & (F.col("l_linenumber") <= 2)
        )
        .select("l_orderkey", "l_linenumber", "disc_or_null")
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("projection",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 duplicate elimination (partial-aggregate dedup before the
    exchange, so the shuffle carries only distinct keys per partition)."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
