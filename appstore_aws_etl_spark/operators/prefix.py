"""Scale-safe global prefix sum (two-phase cumulative aggregation).

A global ``sum(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` forces
every row through ONE partition — the classic single-reducer bottleneck
(Spark even warns "No Partition Defined for Window operation"). The
distributed shape is the textbook two-phase scan:

1. range-partition by the order key (so partitions tile the key space
   in order) and sort within partitions;
2. aggregate one partial sum per partition — a tiny frame — and
   cumulative-sum THOSE in partition-id order to get each partition's
   starting offset;
3. broadcast the offsets back and add them to the partition-local
   running sum.

Only step 2 is single-partition, over #partitions rows. The result
equals the global window exactly up to float association order; for
fixed-decimal inputs (money), rounding at the input's decimal
precision makes it bit-deterministic because every true prefix value
lies ON the rounding grid (never at a midpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partitioned_prefix_sum(
    df: DataFrame,
    value: str,
    order_by: list[str],
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_by]).sortWithinPartitions(
        *order_by
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        with_pid.groupBy("_pid")
        .agg(F.sum(value).alias("_psum"))
        .withColumn("_offset", F.coalesce(F.sum("_psum").over(w_off), F.lit(0.0)))
        .select("_pid", "_offset")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.sum(value).over(w_local) + F.col("_offset"))
        .drop("_pid", "_offset")
    )
