"""Batch sessionization (SURVEY.md §2.9 T3 oracle path, §4.2).

Gap-based session ids via the gaps-and-islands pattern: a new session
starts when the gap to the previous event of the same key exceeds the
threshold; a running sum of new-session flags numbers the sessions.

One shuffle on the key + two stacked windows over the same ordering
(Catalyst collapses them into a single sort). The streaming twin is
``session_window`` in streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Add a per-key session id column (1-based, ordered by time).

    Pass ``tie_break`` columns (e.g. a unique event id) whenever ``ts``
    can repeat within a key — they make the window ordering, and hence
    the session numbering, deterministic (SURVEY.md §7.4.2).
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (tie_break or [])]
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts).cast("long") - prev_ts.cast("long") > F.lit(gap_seconds))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
