"""Skew-handling join utilities (SURVEY.md §4.1 AQE notes).

AQE's skew-join splitting handles most skew automatically; explicit
salting remains necessary when (a) AQE is unavailable (streaming
micro-batches), or (b) one join key dominates so heavily that even
split partitions overwhelm a task. ``salted_join`` spreads each hot
left key over ``salt_buckets`` partitions and replicates the matching
right rows across those buckets — turning one straggler task into
``salt_buckets`` even ones at the cost of replicating only the small
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted and the right side
    replicated ``salt_buckets`` times. Result equals a plain join
    (column set = left ∪ right minus the duplicate key)."""
    salted_left = left.withColumn(
        _SALT, (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets).cast("int")
    )
    replicated_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(replicated_right, on=[on, _SALT], how=how).drop(_SALT)
