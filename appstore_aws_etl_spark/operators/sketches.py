"""Streaming-sketch operators: Misra-Gries heavy hitters.

The 100 TB shape for "which tokens exceed phi of the corpus": a full
GROUP BY token materializes the entire vocabulary (billions of rows of
mostly-tail tokens) just to throw almost all of it away. Misra-Gries
bounds that: each partition keeps at most k counters while streaming
its rows (undercount <= n_partition / k), merged candidates are a
guaranteed superset of every token with frequency >= N/k, and one
exact recount of the (tiny, broadcast) candidate set restores exact
counts. Total cost: one streaming pass + one semi-join-filtered
aggregation — the vocabulary-sized shuffle never happens.

Guarantee used: with k >= 1/phi counters per partition, any token with
global frequency >= phi*N survives in at least one partition summary
(its global undercount across merged summaries is < N/k <= phi*N).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(batches: Iterator[pd.DataFrame], col: str, k: int):
    counters: dict[str, int] = {}
    for pdf in batches:
        for tok, cnt in pdf[col].value_counts().items():
            cnt = int(cnt)
            if tok in counters:
                counters[tok] += cnt
            elif len(counters) < k:
                counters[tok] = cnt
            else:
                # decrement-all by the min survivable amount
                dec = min(cnt, min(counters.values()))
                counters = {t: c - dec for t, c in counters.items() if c > dec}
                if cnt > dec:
                    counters[tok] = cnt - dec
    if counters:
        yield pd.DataFrame({col: list(counters), "mg_count": list(counters.values())})


def heavy_hitters(tokens: DataFrame, col: str, phi: float) -> DataFrame:
    """Exact tokens-with-frequency >= phi*N via MG candidates + exact
    recount. ``tokens`` is a single-column stream; the result columns
    are (col, cnt, share)."""
    k = max(8, int(4.0 / phi))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _misra_gries_partition(batches, col, k)

    candidates = (
        tokens.mapInPandas(mg, schema=f"{col} string, mg_count long")
        .groupBy(col)
        .agg(F.sum("mg_count").alias("mg_est"))
        .select(col)
    )
    n_total = tokens.count()  # parameter-only scalar
    exact = (
        # candidate count is <= k per input partition, so it grows with
        # the partition count, not a constant — no forced broadcast; AQE
        # ships it while observed-small.
        tokens.join(candidates, col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(phi) * F.lit(float(n_total)))
    )
    return exact.select(
        col, "cnt", F.round(F.col("cnt") / F.lit(float(n_total)), 6).alias("share")
    )
