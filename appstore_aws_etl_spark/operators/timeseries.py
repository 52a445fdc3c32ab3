"""Time-series gap-filling rollup (hypertable-style continuous
aggregate, SURVEY.md §4.2 "custom operators").

``gapfill_rollup`` buckets events to a fixed grain per key, then fills
the empty buckets between each key's first and last activity with
zero/default rows — the dense series every downstream
window/forecast/chart consumer wants.

Plan shape: one aggregation shuffle for the rollup + one per-key span
aggregation + an explode of `sequence(first, last, step)` joined back
LEFT — the explode generates rows JVM-side, so density costs no Python
and no driver round-trip. Spans are per-key, so a key active for one
hour adds one row, not the global time range (critical when keys churn
across a 100 TB history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..ckpt import CHECKPOINT_LEVEL


def gapfill_rollup(
    events: DataFrame,
    key: str,
    ts: str,
    grain: str = "1 hour",
    agg_col: str | None = None,
) -> DataFrame:
    """Dense per-(key, bucket) rollup: n_events (+ sum of ``agg_col``)
    with zero-filled buckets inside each key's [first, last] span."""
    step = F.expr(f"INTERVAL {grain}")
    bucketed = events.select(
        F.col(key), F.window(ts, grain).start.alias("bucket"),
        *( [F.col(agg_col)] if agg_col else [] ),
    )
    rolled = bucketed.groupBy(key, "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        *(
            [F.round(F.sum(agg_col), 2).alias(f"sum_{agg_col}")]
            if agg_col
            else []
        ),
    )
    spans = rolled.groupBy(key).agg(
        F.min("bucket").alias("first_b"), F.max("bucket").alias("last_b")
    )
    dense = spans.select(
        key, F.explode(F.sequence("first_b", "last_b", step)).alias("bucket")
    )
    out = dense.join(rolled, on=[key, "bucket"], how="left").withColumn(
        "n_events", F.coalesce("n_events", F.lit(0))
    )
    if agg_col:
        out = out.withColumn(
            f"sum_{agg_col}", F.coalesce(f"sum_{agg_col}", F.lit(0.0))
        )
    return out


def ewma(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.2,
    id_col: str = "event_id",
    order_cols: tuple[str, ...] = (),
    seg_seconds: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Exponentially weighted moving average per key — the classic
    sequential recurrence (y_t = a*x_t + (1-a)*y_{t-1}, seeded
    y_0 = x_0) that window functions cannot express without
    overflow-prone pow() tricks.

    Determinism contract: both paths compute the same recurrence and
    agree with a sequential evaluation to within float ulp (~1e-12
    relative); the segmented stitch is exact in real arithmetic but
    reassociates float ops, so unrounded outputs across different
    ``seg_seconds`` settings are equal only to that tolerance. Final
    rounding (``round_to`` decimals, default 6) is applied JVM-side via
    Spark ROUND — HALF_UP, i.e. ties away from zero, the same
    convention as ANSI/DuckDB ``round()`` — identically on both paths.
    A value within one ulp of a rounding boundary can therefore still
    differ in the last printed digit between ``seg_seconds`` settings;
    callers needing cross-config bitwise equality should pass
    ``round_to=None`` and compare with a relative tolerance.

    Default path: ``mapInPandas`` over key-repartitioned, key-and-time-
    sorted partitions — ONE Python invocation per partition, then a
    single ``groupby(...).ewm`` whose group loop is pandas-internal
    (cython) — versus ``applyInPandas``'s one Python call per key,
    which is overhead-dominated when keys are small (measured ~2.5x
    slower here with ~65-row groups). A key never spans partitions, so
    the memory bound is the largest KEY.

    ``seg_seconds`` engages the scale path for keys too big for one
    worker: rows pre-split into (key, coarse time segment) units — so a
    huge key spreads over many partitions and the memory bound becomes
    the SEGMENT (pure config) — then the segments are stitched exactly:

    1. per segment, one pandas pass yields the unseeded EWMA ``u_t``,
       the in-segment position ``pos`` (1-based) and first value ``xf``;
    2. the true segment-final values obey the affine recurrence
       ``y_k = u_end(k) + (1-a)^(n_k) * (y_(k-1) - xf(k))`` — composed
       sequentially per key over the per-segment SUMMARY rows (one row
       per segment: a reduction by the segment size, tiny), the classic
       parallel-prefix treatment of a linear recurrence;
    3. every row is corrected JVM-side:
       ``y_t = u_t + (1-a)^pos * (seed - xf)`` (exact algebra, not an
       approximation; ``(1-a)^pos`` underflows to 0 for rows far from
       the boundary, which is precisely the decayed-to-nothing regime).
    """
    import pandas as pd

    if seg_seconds is not None:
        return _ewma_segmented(
            events, key, ts, value, alpha, id_col, order_cols, seg_seconds,
            round_to,
        )

    fields = [events.schema[c] for c in (key, id_col, value)]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    out_schema += ", ewma double"
    sort_cols = [key, ts, *order_cols]

    def fn(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        # rows arrive partition-sorted by (key, ts, ...); concat keeps
        # that order, so the recurrence just needs the group boundaries.
        # groupby-window results are ordered by per-level factorization
        # codes, NOT row appearance — so align back by the original row
        # index (droplevel), never positionally (reset_index(drop=True)
        # silently mis-assigns rows when group order differs).
        e = (
            pdf.groupby(key, sort=False)[value]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .droplevel(0)
        )
        out = pdf[[key, id_col, value]].copy()
        out["ewma"] = e
        yield out

    cols = list(dict.fromkeys([key, id_col, value, ts, *order_cols]))
    out = (
        events.select(*cols)
        .repartition(F.col(key))
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(fn, schema=out_schema)
    )
    if round_to is not None:
        out = out.withColumn("ewma", F.round("ewma", round_to))
    return out


def _ewma_segmented(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    id_col: str,
    order_cols: tuple[str, ...],
    seg_seconds: int,
    round_to: int | None,
) -> DataFrame:
    """(key, time-segment) pre-split EWMA with exact seed stitching —
    see ``ewma``. One full-data shuffle on (key, segment), one tiny
    summary aggregation + per-key sequential seed composition, one
    join of seeds back onto the rows (JVM-side correction). The seeds
    join is deliberately left to AQE rather than hinted: seed
    cardinality is #segments (data / segment size), which AQE
    broadcasts when it fits and shuffle-joins when a pathological
    segment count would make a broadcast OOM — the runtime size check
    is the correct arbiter, not a static hint."""
    import pandas as pd

    fields = [events.schema[c] for c in (key, id_col, value)]
    typed = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    local_schema = typed + ", __seg long, __u double, __pos long, __xf double"
    key_type = events.schema[key].dataType.simpleString()
    sort_cols = [key, "__seg", ts, *order_cols]

    cols = list(dict.fromkeys([key, id_col, value, ts, *order_cols]))
    base = events.select(*cols).withColumn(
        "__seg", F.floor(F.unix_timestamp(F.col(ts)) / F.lit(seg_seconds))
    )

    def local(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        g = pdf.groupby([key, "__seg"], sort=False)
        # CORRECTNESS: multi-key groupby-window results come back in
        # per-level factorization-code order — e.g. a __seg value first
        # observed under a DIFFERENT key reorders this key's groups —
        # so positional reassignment (reset_index(drop=True)) silently
        # shifts __u across rows. droplevel leaves the original row
        # index, and assignment aligns on it exactly.
        u = g[value].ewm(alpha=alpha, adjust=False).mean().droplevel([0, 1])
        out = pdf[[key, id_col, value, "__seg"]].copy()
        out["__u"] = u
        out["__pos"] = g.cumcount() + 1
        out["__xf"] = g[value].transform("first").astype("float64")
        yield out

    # lazy localCheckpoint, not persist(): materialized once on first
    # action and shared by the summary agg and the final join like a
    # cache, but the blocks are released by the ContextCleaner when
    # this frame is GC'd — a 201-query long-lived session never
    # accumulates pinned CacheManager entries from this operator.
    part1 = (
        base.repartition(F.col(key), F.col("__seg"))
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(local, schema=local_schema)
        .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    )

    summ = part1.groupBy(key, "__seg").agg(
        F.max("__pos").alias("__n"),
        F.max_by("__u", "__pos").alias("__u_end"),
        F.first("__xf").alias("__xf"),
    )

    def seeds_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__seg").reset_index(drop=True)
        seeds, y_prev = [], None
        for n, u_end, xf in zip(pdf["__n"], pdf["__u_end"], pdf["__xf"]):
            seeds.append(y_prev)
            decay = (1.0 - alpha) ** int(n)
            y_prev = u_end if y_prev is None else u_end + decay * (y_prev - xf)
        pdf["__seed"] = pd.array(seeds, dtype="float64")
        return pdf[[key, "__seg", "__seed"]]

    seeds = summ.groupBy(key).applyInPandas(
        seeds_fn, schema=f"{key} {key_type}, __seg long, __seed double"
    )

    corrected = F.col("__u") + F.pow(F.lit(1.0 - alpha), F.col("__pos")) * (
        F.col("__seed") - F.col("__xf")
    )
    stitched = F.when(
        F.col("__seed").isNull() | F.isnan("__seed"), F.col("__u")
    ).otherwise(corrected)
    if round_to is not None:
        stitched = F.round(stitched, round_to)
    return (
        part1.join(seeds, [key, "__seg"], "left")
        .withColumn("ewma", stitched)
        .select(key, id_col, value, "ewma")
    )


def interpolate_linear(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    grain: str = "1 hour",
    round_to: int = 4,
) -> DataFrame:
    """Gap-filled rollup with LINEAR interpolation: bucket ``value`` to
    the grain per key (4-dp-rounded mean), densify each key's
    [first, last] activity span, and fill every silent bucket with the
    time-weighted line between its bracketing observations — the
    hypertable `interpolate()` companion to ``gapfill_rollup``'s
    zero-fill.

    Plan shape (all JVM-side, no Python): one rollup shuffle, one span
    aggregation + `sequence` explode for density, a LEFT join back,
    then ONE window sort per key evaluating all four carry columns —
    `last(ignorenulls)` carries the previous observation (value +
    bucket) forward, `first(ignorenulls)` over the mirrored frame
    carries the next observation backward, and the interpolation
    itself is row-local arithmetic on epoch seconds. Spans are per-key,
    so density scales with each key's own activity window, and the
    window state is O(1) per direction — both frames are running
    carries, not buffered ranges, so a key with a year-long span
    streams through one sort with constant memory.

    Determinism: the bucket mean is rounded to ``round_to`` before
    interpolation, so the line endpoints are identical doubles on any
    engine; the interpolated value is then a single rounded expression
    over exact integer epoch differences.
    """
    from pyspark.sql import Window

    step = F.expr(f"INTERVAL {grain}")
    rolled = (
        events.select(F.col(key), F.window(ts, grain).start.alias("bucket"), F.col(value))
        .groupBy(key, "bucket")
        .agg(F.round(F.avg(value), round_to).alias("v"))
    )
    spans = rolled.groupBy(key).agg(
        F.min("bucket").alias("first_b"), F.max("bucket").alias("last_b")
    )
    dense = spans.select(
        key, F.explode(F.sequence("first_b", "last_b", step)).alias("bucket")
    )
    j = dense.join(rolled, on=[key, "bucket"], how="left")

    back = Window.partitionBy(key).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy(key).orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    pv = F.last("v", ignorenulls=True).over(back)
    pb = F.last(obs_bucket, ignorenulls=True).over(back)
    nv = F.first("v", ignorenulls=True).over(fwd)
    nb = F.first(obs_bucket, ignorenulls=True).over(fwd)
    # interior gaps always have both brackets (the span is bounded by
    # observed buckets), so the epoch difference is never zero here
    frac = (
        F.unix_timestamp("bucket") - F.unix_timestamp(pb)
    ).cast("double") / (F.unix_timestamp(nb) - F.unix_timestamp(pb)).cast("double")
    # round-half-up via floor(x*scale + 0.5): 4-dp endpoints with
    # dyadic fracs (a gap's exact midpoint) put the true value ON a
    # decimal midpoint, where engines' round() implementations differ
    # on doubles — floor on the identical IEEE expression does not
    scale = F.lit(float(10 ** round_to))
    interp = F.floor((pv + (nv - pv) * frac) * scale + F.lit(0.5)) / scale
    return j.select(
        key,
        "bucket",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias("value_interp"),
        F.col("v").isNull().alias("is_gap"),
    )


def holt_linear(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    id_col: str = "event_id",
    order_cols: tuple[str, ...] = (),
    round_to: int | None = 6,
) -> DataFrame:
    """Holt double exponential smoothing per key — the COUPLED linear
    recurrence (level l, trend b):

        l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}

    seeded l_1 = x_1, b_1 = 0. Same execution shape as ``ewma``'s
    default path: ONE mapInPandas over key-repartitioned, key-and-time
    sorted partitions, a python walk per key (the state is a 2-vector,
    so there is no pandas cython shortcut).

    Scale note: the update is affine — [l, b, 1]_t = M_t @ [l, b, 1]_
    {t-1} for a per-row 3x3 matrix — so matrix products compose
    associatively and the segmented parallel-prefix treatment used by
    ``ewma(seg_seconds=...)`` generalizes directly when single keys
    outgrow a worker; not implemented until needed."""
    import pandas as pd

    fields = [events.schema[c] for c in (key, id_col, value)]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    out_schema += ", level double, trend double"
    sort_cols = [key, ts, *order_cols]

    def fn(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        # rows arrive partition-sorted by (key, ts, ...), so keys are
        # CONTIGUOUS and groupby(sort=False) iterates groups in row
        # order with within-group order preserved — positional append
        # below therefore aligns with pdf's row order (the same
        # contiguity argument ewma's docstring makes)
        out_rows = []
        for _, g in pdf.groupby(key, sort=False):
            l = b = None
            for x in g[value].astype("float64"):
                if l is None:
                    l, b = float(x), 0.0
                else:
                    l_prev = l
                    l = alpha * x + (1.0 - alpha) * (l + b)
                    b = beta * (l - l_prev) + (1.0 - beta) * b
                out_rows.append((l, b))
        res = pdf[[key, id_col, value]].copy()
        res["level"] = [r[0] for r in out_rows]
        res["trend"] = [r[1] for r in out_rows]
        yield res

    cols = list(dict.fromkeys([key, id_col, value, ts, *order_cols]))
    shuffled = (
        events.select(*cols)
        .repartition(F.col(key))
        .sortWithinPartitions(*sort_cols)
    )
    out = shuffled.mapInPandas(fn, schema=out_schema)
    if round_to is not None:
        out = out.select(
            key, id_col, value,
            F.round("level", round_to).alias("level"),
            F.round("trend", round_to).alias("trend"),
        )
    return out
