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
) -> DataFrame:
    """Add a per-key session id column (1-based, ordered by time).

    Ordering must be made deterministic by the caller if ``ts`` has
    duplicates within a key (pass a pre-deduplicated or tie-broken
    frame); session *membership* is unaffected by tie order.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev_ts = F.lag(ts).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts).cast("long") - prev_ts.cast("long") > F.lit(gap_seconds))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
