"""The declared query inventory (SURVEY.md §2).

Importing this package populates ``appstore_aws_etl_spark.registry.REGISTRY``
with every implemented query key. Module order mirrors the build plan
(SURVEY.md §7.1).
"""

from . import (  # noqa: F401
    aggregates,
    analytics,
    flagship,
    functions,
    graph,
    joins,
    lakehouse,
    llm,
    projection,
    scans,
    setops,
    sorts,
    streaming_batch,
    tpch_rest,
    udx,
    windows,
)

__all__ = [
    "flagship",
    "projection",
    "aggregates",
    "joins",
    "windows",
    "sorts",
    "setops",
    "scans",
    "functions",
]
