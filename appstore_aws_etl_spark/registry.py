"""Query registry — the single source of truth wiring SURVEY.md §2 rows
to the driver contract in ``__spark_entry__.py``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus
(optionally) the equivalent ANSI SQL that DuckDB runs on the same parquet
tables. Queries without oracle SQL get the driver's weaker rows-only
check (approximate / streaming-execution / binary ops, SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under its SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def sql_query(name: str, spark_sql: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a query expressed as Spark SQL over the fixture views.

    Catalyst produces the same plan for SQL and DataFrame code; for
    operators whose clearest declaration *is* SQL (grouping sets, complex
    windows) we register the SQL text directly. ``oracle`` defaults to
    the same text when it is ANSI enough for DuckDB.
    """
    from . import catalog

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql) -> DataFrame:
        catalog.register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = f"Spark SQL query for key {name!r}:\n{spark_sql}"
    REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle or spark_sql, tags=tags)
    return fn
