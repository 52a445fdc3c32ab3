"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementation lives in ``appstore_aws_etl_spark``; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import appstore_aws_etl_spark.queries  # noqa: F401  (populates REGISTRY)
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.shiplib import arm_env, ensure_workers_can_import

# Workers deserialize module-level UDF functions by reference, so the
# package must be importable in the worker interpreter no matter where
# the host process launched from (see shiplib docstring).
arm_env()

FLAGSHIP = "agg_group"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    ensure_workers_can_import(spark)
    return REGISTRY[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    a budgeted correctness sweep (~50 keys/round, dict order) maximizes
    fresh evidence. The order is DERIVED from the CORRECTNESS_r*.json
    artifacts in the repo root (appstore_aws_etl_spark.evidence):
    never-evidenced keys first, then keys whose oracle was upgraded
    after a rows-only sweep, then proven keys oldest-evidence-first —
    so a new round's artifact re-prioritizes the next sweep with no
    code edit (rounds 2-4 hand-maintained frozensets here and twice
    went stale, stranding unswept keys past the budget)."""
    from appstore_aws_etl_spark.evidence import sweep_order

    has_oracle = {name: spec.oracle is not None for name, spec in REGISTRY.items()}
    order = sweep_order(list(REGISTRY), has_oracle)

    def _armed(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: _armed(REGISTRY[name].fn) for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-bearing query key."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
