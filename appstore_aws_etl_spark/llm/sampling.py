"""Deterministic sampling / splitting / mixing for training-data
pipelines.

Reproducibility is the whole point: assignment must be a pure function
of the row key (never rand(), never partition-dependent), so re-runs,
backfills, and incremental updates agree on every row. The hash is a
Knuth multiplicative hash over the key — plain 64-bit arithmetic that
any engine (and the DuckDB oracle) reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant (golden ratio of 2^32)
_KNUTH = 2654435761
_MOD = 1 << 32


def key_hash(key_col: str, seed: int = 0) -> F.Column:
    """Deterministic uniform-ish bucket in [0, 10000) from an integer
    key: pmod(pmod((key + seed) * 2654435761, 2^32), 10000).

    ``pmod`` (not ``%``) so negative keys still land in [0, 10000)
    instead of collapsing into the first split via a negative bucket.
    Keys must stay below ~3.47e9 — beyond that ``(key+seed)*K``
    exceeds int64 (error under ANSI mode, silent wrap otherwise, both
    diverging from an oracle that errors on BIGINT overflow). Row keys
    here are surrogate ids well under 2^31; for unbounded or string
    keys use ``F.xxhash64(key, lit(seed))`` instead (not the default
    because the published oracle SQL pins this exact Knuth formula)."""
    return F.pmod(
        F.pmod((F.col(key_col) + F.lit(seed)) * F.lit(_KNUTH), F.lit(_MOD)),
        F.lit(10000),
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) with the
    given weights, deterministically by key. Weights must sum to 1."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = key_hash(key_col, seed)
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        acc += w
        cond = bucket < F.lit(int(round(acc * 10000)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic ~fraction sample by key hash (same rows every run,
    stable under repartitioning — unlike df.sample whose outcome
    depends on partition layout)."""
    return df.filter(key_hash(key_col, seed) < F.lit(int(round(fraction * 10000))))


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    seed: int = 0,
    source_col: str = "mix_source",
) -> DataFrame:
    """Mix datasets at given sampling rates into one stream: each
    source is hash-sampled at its rate and tagged. Rates are per-source
    keep-probabilities (not normalized shares)."""
    out = None
    for name, (df, rate) in sources.items():
        part = hash_sample(df, key_col, rate, seed=seed).withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    return out


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Exact-proportion stratified sample: ceil(fraction * n) rows per
    stratum, selected by key-hash order (deterministic, partition-
    layout-stable; ties broken by key). Unlike ``hash_sample``, small
    strata are never over/under-shot by hash variance — the per-stratum
    quota is exact, which is what training-mix proportions need.

    Scale shape: one shuffle on the strata key; the count rides the
    same window partitioning as the row_number, so no second pass.
    """
    w = Window.partitionBy(*strata_cols).orderBy(key_hash(key_col, seed), key_col)
    n = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rn") <= F.ceil(F.lit(fraction) * F.col("__n")))
        .drop("__rn", "__n")
    )
