"""Round-13 idle re-adjudication of BENCH100X_r13's >2x band.

The r13 sweep ran on a drifting box-hour: its in-sweep Spark numbers
exceed the SAME session's idle interleaved A/Bs by 40-80% on identical
plans (q3 6.69 in-sweep vs 4.84 idle, AB_BUCKETED100X_r13; q10 5.87 vs
4.16), and part of the DuckDB phase overlapped a test run. Protocol
(BASELINE.md): every key the sweep put over 2x is re-timed IDLE,
Spark and DuckDB interleaved per key in one session, warm + 3 timed
runs, medians and mins — the same re-adjudication r12 ran for its
drift band.

    python tools/readjud_r13.py --out READJUD_r13.json [keys...]
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.schemas import TABLE_NAMES
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")
N_RUNS = int(os.environ.get("READJUD_RUNS", "3"))

# sweep keys > 2x (BENCH100X_r13 pre-adjudication), cheapest first so a
# partial run still covers most keys
DEFAULT_KEYS = [
    "llm_weighted_sample",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_share",
    "analytics_cohort_retention",
    "tpch_q22_dormant_customers",
    "ts_seasonal_baseline",
    "tpch_q15_top_supplier",
    "sub_lateral_topk",
    "analytics_dau_wau",
    "agg_heavy_hitters",
    "tpch_q12_late_lines",
    "tpch_q18_large_orders",
    "tpch_q10_returned_items",
    "sub_recursive_hierarchy",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_exists",
    "tpch_q5_local_supplier_volume",
    "join_range",
    "join_multikey",
    "graph_degree_distribution",
]
FORCED_EVAL = {"ts_seasonal_baseline", "ts_ewma"}


def main() -> None:
    out_path = "READJUD_r13.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    keys = args or DEFAULT_KEYS

    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )
    spark = get_spark(
        "readjud_r13",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def spark_once(key: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[key].fn(spark, FIXTURE)
        if key in FORCED_EVAL:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        release_checkpoints(spark)
        return round(time.perf_counter() - t0, 3)

    def duck_once(key: str) -> float:
        agg = "max(hash(t))" if key in FORCED_EVAL else "count(*)"
        t0 = time.perf_counter()
        con.execute(f"SELECT {agg} FROM ({REGISTRY[key].oracle}) t").fetchone()
        return round(time.perf_counter() - t0, 3)

    results: dict[str, dict] = {}
    for key in keys:
        spark_once(key)  # warm both engines before any timed run
        duck_once(key)
        st, dt = [], []
        for _ in range(N_RUNS):  # interleaved: drift hits both sides
            st.append(spark_once(key))
            dt.append(duck_once(key))
        results[key] = {
            "spark": st,
            "duckdb": dt,
            "spark_median": statistics.median(st),
            "duck_median": statistics.median(dt),
            "spark_min": min(st),
            "duck_min": min(dt),
            "ratio_median": round(statistics.median(st) / max(statistics.median(dt), 1e-9), 2),
            "ratio_min": round(min(st) / max(min(dt), 1e-9), 2),
        }
        print(key, json.dumps(results[key]), flush=True)

    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "config": f"idle interleaved per key, warm + {N_RUNS} timed runs each engine",
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["ratio_median"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
