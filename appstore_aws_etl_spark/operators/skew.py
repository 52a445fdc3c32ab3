"""Skew-handling join utilities (SURVEY.md §4.1 AQE notes).

AQE's skew-join splitting handles most skew automatically; explicit
salting remains necessary when (a) AQE is unavailable (streaming
micro-batches), or (b) one join key dominates so heavily that even
split partitions overwhelm a task. ``salted_join`` is the two-path
form: rows with *hot* keys are salted over ``salt_buckets`` partitions
(the matching right rows replicated across those buckets), everything
else takes a plain join — so the replication cost is paid only for the
skew tail, not the whole right side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# join types whose output is well-defined under right-side replication:
# every *matched* right row may legitimately appear once per salt bucket
# it matches (inner/left), and semi/anti only test existence. Right and
# full outer are NOT: an unmatched right row would surface once per
# bucket, multiplying nulls into the result.
_SUPPORTED_HOW = frozenset(
    {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
     "left_semi", "anti", "leftanti", "left_anti"}
)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    hot_keys: Sequence | None = None,
    hot_key_threshold: int = 1_000_000,
    max_hot_keys: int = 1024,
) -> DataFrame:
    """Equi-join on ``on`` with hot-key-only salting. Result equals a
    plain ``left.join(right, on, how)`` for the supported join types
    (column set = left ∪ right minus the duplicate key).

    ``hot_keys``: the skew tail to salt. If None, detected with one
    aggregation over the left keys (count >= hot_key_threshold); only
    the hot keys themselves come back to the driver — and only the
    ``max_hot_keys`` HEAVIEST of them (round-13 hardening: a
    pathological threshold choice — say 1 on a high-cardinality key —
    otherwise returns the whole key domain to the driver). Keys beyond
    the cap take the cold path, where AQE's skew splitting still
    applies; salting only ever needs the extreme tail. Right/full
    outer joins raise: replicated unmatched right rows would appear
    once per salt bucket.
    """
    if how not in _SUPPORTED_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SUPPORTED_HOW)}, got {how!r}: "
            "right/full outer would emit each unmatched right row "
            f"{salt_buckets} times"
        )
    if hot_keys is None:
        hot_keys = [
            r[on]
            for r in (
                left.groupBy(on)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") >= hot_key_threshold)
                # bounded driver collect: heaviest keys first, capped
                # (TakeOrderedAndProject, not a full sort)
                .orderBy(F.col("__n").desc())
                .limit(max_hot_keys)
                .collect()
            )
        ]
    hot_keys = list(hot_keys)
    if not hot_keys:
        return left.join(right, on=on, how=how)

    is_hot = F.col(on).isin(hot_keys)
    # null keys never match an equi-join but must survive left/anti
    # paths: isin() is NULL for them, so route them cold explicitly
    left_hot = left.filter(is_hot)
    left_cold = left.filter(F.col(on).isNull() | ~is_hot)
    cold = left_cold.join(right, on=on, how=how)

    salted_left = left_hot.withColumn(
        _SALT,
        (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets).cast("int"),
    )
    replicated_right = right.filter(is_hot).withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    hot = salted_left.join(replicated_right, on=[on, _SALT], how=how).drop(_SALT)
    return hot.unionByName(cold)
