"""Data-layout operators: Z-order (Morton) interleaving for multi-column
clustering.

At 100 TB the dominant read cost is how many files a 2-predicate query
touches; sorting by a Z-value interleaving both key columns gives
min/max file statistics locality on BOTH dimensions at once (the
standard lakehouse OPTIMIZE ZORDER layout). The interleave is pure
64-bit shift/mask arithmetic — identical results on any engine, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` into the even bit positions of
    a 32-bit lane (x -> x with a zero bit between every source bit)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue(a: Column, b: Column) -> Column:
    """64-bit Morton code interleaving the low 16 bits of two integer
    columns (a in even positions, b in odd)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_by(df: DataFrame, col_a: str, col_b: str, out_col: str = "zval") -> DataFrame:
    """Attach the Z-value and range-sort by it — the write-side layout
    step before a partitioned/clustered sink (repartitionByRange keeps
    the sort cluster-wide without a global single-partition sort)."""
    with_z = df.withColumn(out_col, zvalue(F.col(col_a), F.col(col_b)))
    return with_z.repartitionByRange(F.col(out_col)).sortWithinPartitions(out_col)
