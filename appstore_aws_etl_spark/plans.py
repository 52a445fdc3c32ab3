"""Plan inspection helpers.

The engine's scale claims (pushdown, pruning, broadcast, partial agg)
are verified against the *physical plan*, not trusted — tests assert on
these strings (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text of a DataFrame's physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan lacks {missing}:\n{plan}")
