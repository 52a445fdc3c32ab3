"""As-of join (SURVEY.md §2.3 J11, §4.2): nearest prior-timestamp match.

Spark SQL has no native ASOF JOIN (DuckDB and pandas do); this operator
re-expresses it with a *single shuffle + window* instead of the naive
O(n*m) inequality join:

1. union left and right rows, tagged, with right payload columns
   null-padded on the left side;
2. one window partitioned by the join keys, ordered by
   (ts, side, tie-break), frame = unbounded preceding .. current row;
3. ``last(struct(ts, *payloads), ignorenulls=True)`` carries the most
   recent right row — one struct per row, so the matched timestamp and
   every payload column always come from the *same* right row even when
   payload values are null (null payloads never fall back to older rows,
   and the tolerance gate judges exactly the row whose payload is
   emitted).

Cost model: one exchange on the join keys + one in-partition sort —
identical asymptotics to a sort-merge join, so it scales wherever SMJ
does. Key skew is handled by AQE the same way as any windowed op.

Semantics match DuckDB ``ASOF JOIN`` with ``>=`` (backward, inclusive);
``allow_exact_matches=False`` gives strict ``>``. Ties among right rows
at the same timestamp resolve to the greatest ``tie_break`` value —
always pass one for deterministic output (SURVEY.md §7.4.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tie_break: str | None = None,
    allow_exact_matches: bool = True,
    direction: str = "backward",
    payload_prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row
    within the same ``on`` key group: the latest with
    ``right.ts <= left.ts`` (direction="backward", default) or the
    earliest with ``right.ts >= left.ts`` (direction="forward");
    ``allow_exact_matches=False`` makes the inequality strict. Left
    rows with no match keep nulls (left-outer semantics). Ties among
    right rows resolve to the greatest ``tie_break`` (backward) /
    smallest (forward).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if direction == "nearest" and not allow_exact_matches:
        raise ValueError("direction='nearest' supports inclusive matches only")
    right_payload = right_payload or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    if "__rts" in right_payload:
        # the carried struct reserves field "__rts" for the matched right
        # timestamp; a payload column of that name would collide and make
        # getField("__rts") ambiguous, corrupting the tolerance gate
        raise ValueError("right payload column name '__rts' is reserved")

    ts = "__asof_ts"
    tie = "__asof_tie"

    def tie_col(df: DataFrame, is_left: bool) -> Column:
        if is_left or tie_break is None:
            return F.lit(None).cast("long")
        return F.col(tie_break).cast("long")

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(_SIDE),
        tie_col(left, True).alias(tie),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{payload_prefix}{c}") for c in right_payload],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left.columns],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(_SIDE),
        tie_col(right, False).alias(tie),
        *[F.col(c).alias(f"{payload_prefix}{c}") for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # One struct per right row bundles its timestamp with ALL its payload
    # columns, and is null on left rows. Carrying this single struct (not
    # each payload independently) guarantees the tolerance check and every
    # emitted payload come from the same right row: a nearest right row
    # with a null payload value yields null payload, never a stale value
    # from an older right row smuggled past the tolerance gate.
    row_struct = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            F.col(ts).alias("__rts"),
            *[F.col(f"{payload_prefix}{c}").alias(c) for c in right_payload],
        ),
    )
    unioned = unioned.withColumn("__asof_row", row_struct)

    if direction == "nearest":
        # two frames over the same key partition: backward carry (right
        # sorts before left at equal ts, so dist-0 matches land on the
        # backward side) and forward carry; pick the closer non-null.
        wb = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts).asc(), F.col(_SIDE).asc(), F.col(tie).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts).asc(), F.col(_SIDE).desc(), F.col(tie).asc_nulls_last())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.select(
            "*",
            F.last("__asof_row", ignorenulls=True).over(wb).alias("__b_row"),
            F.first("__asof_row", ignorenulls=True).over(wf).alias("__f_row"),
        )
        here = F.col(ts).cast("double")
        b_ts = F.col("__b_row").getField("__rts").cast("double")
        f_ts = F.col("__f_row").getField("__rts").cast("double")
        use_backward = F.when(b_ts.isNull(), F.lit(False)).otherwise(
            f_ts.isNull() | ((here - b_ts) <= (f_ts - here))
        )
        chosen_ts = F.when(use_backward, b_ts).otherwise(f_ts)
        in_tol = (
            F.lit(True)
            if tolerance_seconds is None
            else chosen_ts.isNotNull()
            & (F.abs(here - chosen_ts) <= F.lit(float(tolerance_seconds)))
        )
        return carried.filter(F.col(_SIDE) == 1).select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(
                    in_tol,
                    F.when(
                        use_backward, F.col("__b_row").getField(c)
                    ).otherwise(F.col("__f_row").getField(c)),
                ).alias(f"{payload_prefix}{c}")
                for c in right_payload
            ],
        )

    if direction == "backward":
        # carry the most recent right payload forward in time: right
        # rows sort before left at equal ts for inclusive semantics
        # (so last() sees them), after for strict.
        side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts).asc(), side_order, F.col(tie).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last
    else:
        # forward: carry the next right payload backward in time; left
        # rows sort before right at equal ts for inclusive semantics
        # (so first() over the following frame sees them), after for
        # strict. Tie order ascending -> smallest tie_break wins.
        side_order = F.col(_SIDE).desc() if allow_exact_matches else F.col(_SIDE).asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts).asc(), side_order, F.col(tie).asc_nulls_last())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first

    carried = unioned.select(
        "*",
        carry("__asof_row", ignorenulls=True).over(w).alias("__carry_row"),
    )
    crow = F.col("__carry_row")
    if tolerance_seconds is not None:
        here = F.col(ts).cast("double")
        there = crow.getField("__rts").cast("double")
        dist = (here - there) if direction == "backward" else (there - here)
        keep = there.isNotNull() & (dist <= F.lit(float(tolerance_seconds)))
        payload_out = [
            F.when(keep, crow.getField(c)).alias(f"{payload_prefix}{c}")
            for c in right_payload
        ]
    else:
        payload_out = [
            crow.getField(c).alias(f"{payload_prefix}{c}") for c in right_payload
        ]
    out = carried.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *payload_out,
    )
    return out
