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
from ..ckpt import CHECKPOINT_LEVEL


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
    # one physical evaluation of the range partitioning: the offsets
    # subtree and the main subtree both consume _pid, and two
    # independent evaluations of repartitionByRange can sample
    # DIFFERENT range boundaries — misaligned pids silently corrupt
    # the offsets (observed on the prefix-max sibling)
    with_pid = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
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
        # bounded: one offset row per input partition (parameter-scale)
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.sum(value).over(w_local) + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def partitioned_prefix_max(
    df: DataFrame,
    value: str,
    order_by: list[str],
    out: str = "run_max",
    strict: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running maximum in arrival order, same two-phase shape as
    ``partitioned_prefix_sum`` (and simpler: max needs no offset
    arithmetic, just a greatest() against the preceding partitions'
    max). ``strict=True`` excludes the current row — the watermark
    semantics ("the high-water mark BEFORE this element arrived").
    Exactness: max is association-free, so the distributed result is
    bit-identical to the single-partition window for any type."""
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_by]).sortWithinPartitions(
        *order_by
    )
    # same single-evaluation guard as partitioned_prefix_sum: both
    # subtrees must see ONE pid assignment
    with_pid = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        with_pid.groupBy("_pid")
        .agg(F.max(value).alias("_pmax"))
        .withColumn("_offset", F.max("_pmax").over(w_off))
        .select("_pid", "_offset")
    )
    hi = -1 if strict else Window.currentRow
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = F.max(value).over(w_local)
    return (
        # bounded: one offset row per input partition (parameter-scale)
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.greatest(local, F.col("_offset")))
        .drop("_pid", "_offset")
    )
