"""Slowly-changing-dimension utilities for the serving layer.

``scd2_apply`` — Type-2 history maintenance: an incoming batch of
keyed updates closes each key's open row (sets ``valid_to``) and
appends a new open row effective at the update timestamp. One shuffle
on the dimension key; history rows never rewrite in place, which is
what makes the pattern safe to run incrementally over years of
snapshots.

``snapshot_diff`` — CDC between two snapshots of the same table:
tags every key as added / removed / changed / unchanged (full-outer
join + column comparison).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    eff_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one update batch to an SCD2 history table.

    ``history``: key + attribute columns + [valid_from, valid_to]
    (``valid_to`` null = open row). ``updates``: key + the same
    attribute columns + ``eff_ts_col``. Every update key closes its
    open row at the effective timestamp and appends a new open row;
    keys absent from history simply insert.

    Contract: ONE effective row per key per batch. A batch carrying
    several updates for a key is collapsed to the latest ``eff_ts_col``
    row before the join (without this, N updates fan every history row
    of that key out N times and append N simultaneously-open rows). To
    retain every intermediate version, apply batches in timestamp
    order, one effective timestamp per batch.
    """
    attrs = [c for c in history.columns if c not in (key, valid_from, valid_to)]
    latest = Window.partitionBy(key).orderBy(
        F.col(eff_ts_col).desc(), *[F.col(c).desc_nulls_last() for c in attrs]
    )
    updates = (
        updates.withColumn("__rn", F.row_number().over(latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upd_keys = updates.select(
        F.col(key), F.col(eff_ts_col).alias("__eff")
    )
    adjusted = (
        history.join(upd_keys, on=key, how="left")
        .withColumn(
            valid_to,
            F.when(
                F.col(valid_to).isNull() & F.col("__eff").isNotNull(), F.col("__eff")
            ).otherwise(F.col(valid_to)),
        )
        .drop("__eff")
    )
    new_rows = updates.select(
        F.col(key),
        *[F.col(c) for c in attrs],
        F.col(eff_ts_col).alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    )
    return adjusted.unionByName(new_rows).withColumn(
        "is_current", F.col(valid_to).isNull()
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, change_col: str = "change"
) -> DataFrame:
    """Tag each key across two snapshots: 'added' | 'removed' |
    'changed' | 'unchanged'. Output columns: key, change, plus the
    new snapshot's attributes (null for removed keys)."""
    attrs = [c for c in old.columns if c != key]
    o = old.select(F.col(key).alias("__ok"), *[F.col(c).alias(f"__o_{c}") for c in attrs])
    n = new.select(F.col(key), *attrs)
    joined = n.join(o, n[key] == o["__ok"], "full_outer")

    def _same(c: str) -> Column:
        return (F.col(c) == F.col(f"__o_{c}")) | (
            F.col(c).isNull() & F.col(f"__o_{c}").isNull()
        )

    all_same = None
    for c in attrs:
        all_same = _same(c) if all_same is None else (all_same & _same(c))
    change = (
        F.when(F.col("__ok").isNull(), "added")
        .when(F.col(key).isNull(), "removed")
        .when(all_same, "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        F.coalesce(F.col(key), F.col("__ok")).alias(key),
        change.alias(change_col),
        *[F.col(c) for c in attrs],
    )
