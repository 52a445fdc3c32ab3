"""Flagship query: TPC-H-Q1-style pricing summary (SURVEY.md §7.2).

Exercises scan -> filter -> derived columns -> grouped hash aggregation
(partial + final, map-side combine for free) -> sort. Registered under
the §2.4 A1 key ``agg_group``.

Scale notes: the only shuffle is the group-by on a 6-value key space
(3 returnflags x 2 linestatuses); partial aggregation collapses each map
partition to <=6 rows before the exchange, so the shuffle moves O(cores)
rows regardless of input size — this plan is flat to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

_ORACLE = """
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 2)                         AS sum_qty,
    round(sum(l_extendedprice), 2)                    AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
    round(avg(l_quantity), 2)                         AS avg_qty,
    round(avg(l_extendedprice), 2)                    AS avg_price,
    round(avg(l_discount), 4)                         AS avg_disc,
    count(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("agg_group", oracle=_ORACLE, tags=("agg", "flagship"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 grouped hash aggregation — the flagship pricing summary."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
