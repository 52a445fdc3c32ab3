"""DuckDB baseline comparator (BASELINE.md protocol): wall-clock of
every oracle SQL text on the same parquet, same machine, single
process. Prints one JSON line shaped like bench.py's."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.schemas import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FLAGSHIP = "agg_group"


def main() -> None:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({REGISTRY[name].oracle})").fetchone()
        return time.perf_counter() - t0

    run_once(FLAGSHIP)  # warm the buffer cache
    timings = {FLAGSHIP: statistics.median(run_once(FLAGSHIP) for _ in range(3))}
    for name, spec in REGISTRY.items():
        if name == FLAGSHIP or spec.oracle is None:
            continue
        run_once(name)  # warm-then-time, mirroring bench.py's protocol
        timings[name] = round(run_once(name), 4)
    timings[FLAGSHIP] = round(timings[FLAGSHIP], 4)

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1")
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_wall_clock_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
