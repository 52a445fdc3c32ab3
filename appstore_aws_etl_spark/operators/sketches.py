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
    n_rows = 0
    for pdf in batches:
        n_rows += len(pdf)
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
    # sentinel row (NULL token) carries the partition's row count, so
    # N comes out of the SAME streaming pass as the sketch — a separate
    # tokens.count() job re-tokenized and re-exploded the whole corpus
    # just for one scalar (1/3 of the key's 100x wall time)
    if counters or n_rows:
        yield pd.DataFrame(
            {
                col: list(counters) + [None],
                "mg_count": list(counters.values()) + [n_rows],
            }
        )


def heavy_hitters_docs(
    df: DataFrame, text_col: str, phi: float
) -> DataFrame:
    """Exact heavy hitters straight off the DOCUMENT table: two Arrow
    streaming passes, tokenizing in Python both times.

    Why not ``heavy_hitters`` over an exploded token stream: each pass
    over that stream re-runs the JVM regex split + explode, and at the
    100x tier java.util.regex IS the key's cost (interleaved A/B: the
    3-pass and 2-pass token-stream shapes both read ~10 s because
    ~retokenization dominates; DuckDB streams the same split at SIMD
    rate). Here each pass receives raw text over Arrow and splits with
    C-level ``str.split`` — pass 1 runs Misra-Gries per partition and
    counts tokens (sentinel row); pass 2 recounts ONLY the candidate
    tokens (driver-held parameter set, <= k per input partition)
    with a dict probe per token. The vocabulary-sized shuffle still
    never happens; what moves is k+1 rows per partition, then exact
    candidate counts. Measured 10 -> ~2 s at the 100x tier
    (BASELINE.md round-10 note)."""
    from collections import Counter

    k = max(8, int(4.0 / phi))

    def mg_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_tokens = 0
        for pdf in batches:
            for t in pdf[text_col]:
                if t is None:
                    continue
                toks = t.lower().split()
                n_tokens += len(toks)
                for tok, cnt in Counter(toks).items():
                    if tok in counters:
                        counters[tok] += cnt
                    elif len(counters) < k:
                        counters[tok] = cnt
                    else:
                        dec = min(cnt, min(counters.values()))
                        counters = {
                            t2: c - dec for t2, c in counters.items() if c > dec
                        }
                        if cnt > dec:
                            counters[tok] = cnt - dec
        if counters or n_tokens:
            yield pd.DataFrame(
                {
                    "token": list(counters) + [None],
                    "mg_count": list(counters.values()) + [n_tokens],
                }
            )

    sketch = df.select(text_col).mapInPandas(
        mg_docs, schema="token string, mg_count long"
    )
    rows = sketch.collect()  # <= k+1 rows per partition — parameters
    n_total = sum(r["mg_count"] for r in rows if r["token"] is None)
    cand = {r["token"] for r in rows if r["token"] is not None}

    def recount(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[text_col]:
                if t is None:
                    continue
                for tok in t.lower().split():
                    if tok in cand:
                        counts[tok] = counts.get(tok, 0) + 1
        if counts:
            yield pd.DataFrame({"token": list(counts), "cnt": list(counts.values())})

    exact = (
        df.select(text_col)
        .mapInPandas(recount, schema="token string, cnt long")
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(phi) * F.lit(float(n_total)))
    )
    return exact.select(
        "token", "cnt", F.round(F.col("cnt") / F.lit(float(n_total)), 6).alias("share")
    )


def heavy_hitters(tokens: DataFrame, col: str, phi: float) -> DataFrame:
    """Exact tokens-with-frequency >= phi*N via MG candidates + exact
    recount. ``tokens`` is a single-column stream; the result columns
    are (col, cnt, share)."""
    k = max(8, int(4.0 / phi))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _misra_gries_partition(batches, col, k)

    # one streaming pass yields BOTH the per-partition sketches and
    # (as NULL-token sentinel rows) the per-partition row counts; the
    # tiny result — <= k+1 rows per partition — is lazily checkpointed
    # so the N aggregate and the candidate list don't re-stream the
    # corpus (round 10: the separate count() pass was 1/3 of the key's
    # 100x wall time)
    from ..ckpt import lazy_checkpoint

    sketch = lazy_checkpoint(
        tokens.mapInPandas(mg, schema=f"{col} string, mg_count long")
    )
    n_total = (
        sketch.filter(F.col(col).isNull()).agg(F.sum("mg_count")).first()[0] or 0
    )
    candidates = (
        sketch.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.sum("mg_count").alias("mg_est"))
        .select(col)
    )
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
