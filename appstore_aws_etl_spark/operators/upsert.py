"""Merge/upsert for serving-table refresh (SURVEY.md §1.1 zone 4).

The declared pipeline loads a warehouse (reference README.md:2); real
loads are incremental: new/changed rows replace their targets, the
rest survive. Without a table format that owns MERGE (Delta/Iceberg),
the engine-level form is a keyed full-outer join with source
precedence — one shuffle on the key, and with both sides bucketed on
the key (io/bucketing.py) even that shuffle disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``source`` insert-or-replace rows of ``target`` by key.

    Column set = target's. Source rows with keys absent from target are
    inserts; matching keys take source values; unmatched target rows
    pass through.
    """
    value_cols = [c for c in target.columns if c not in keys]
    s = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in value_cols],
    )
    cond = [target[k] == s[f"__s_{k}"] for k in keys]
    joined = target.join(s, on=cond, how="full_outer")
    out_cols = [
        F.coalesce(target[k], s[f"__s_{k}"]).alias(k) for k in keys
    ] + [
        # source precedence decided by key presence, not value nullness
        F.when(s[f"__s_{keys[0]}"].isNotNull(), s[f"__s_{c}"])
        .otherwise(target[c])
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*out_cols)
