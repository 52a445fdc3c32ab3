"""Round-12 re-adjudication (verdict items 2 and 6): same-session,
same-box Spark-vs-DuckDB ratios for the three keys whose prior
adjudications may be box drift — join_role_playing_dates (r11 read
2.83x), analytics_dau_wau (2.26x), ts_seasonal_baseline (7.38x) —
plus the two r11 re-plans whose post-fix numbers the next tier refresh
must fold in (tpch_q5, tpch_q7; verdict item 8).

Protocol: 100x fixture; DuckDB views over the identical parquet; per
key, warm then 3 timed runs of EACH engine interleaved
(S,D,S,D,S,D) so drift hits both; medians + ratio in one artifact.

    python tools/ab_readjud_r12.py --out AB_READJUD_r12.json
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.schemas import TABLE_NAMES
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")
KEYS = [
    "join_role_playing_dates",
    "analytics_dau_wau",
    "ts_seasonal_baseline",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
]


def main() -> None:
    out_path = "AB_READJUD_r12.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark("ab_readjud_r12", shuffle_partitions=64)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )

    def spark_once(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, FIXTURE).count()
        el = time.perf_counter() - t0
        release_checkpoints(spark)
        return round(el, 2)

    def duck_once(name: str) -> float:
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({REGISTRY[name].oracle})").fetchone()
        return round(time.perf_counter() - t0, 2)

    res = {}
    for name in KEYS:
        spark_once(name)
        duck_once(name)
        s_times, d_times = [], []
        for _ in range(3):
            s_times.append(spark_once(name))
            d_times.append(duck_once(name))
        s_med = sorted(s_times)[1]
        d_med = sorted(d_times)[1]
        res[name] = {
            "spark": s_times,
            "duckdb": d_times,
            "spark_median": s_med,
            "duckdb_median": d_med,
            "ratio": round(s_med / d_med, 2),
        }
        print(name, res[name], flush=True)
    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "config": "local[*] AQE on shuffle=64; per key: warm both engines, then "
        "3 timed runs each interleaved S,D,S,D,S,D; medians reported",
        "r11_readings": {
            "join_role_playing_dates": {"spark": 14.376, "duckdb": 5.083, "ratio": 2.83},
            "analytics_dau_wau": {"spark": 3.361, "duckdb": 1.49, "ratio": 2.26},
            "ts_seasonal_baseline": {"spark": 2.155, "duckdb": 0.292, "ratio": 7.38},
            "tpch_q5_local_supplier_volume": {"spark_presweep": 7.25, "spark_ab": 4.67, "duckdb": 1.931},
            "tpch_q7_volume_shipping": {"spark_presweep": 7.291, "spark_ab": 4.29, "duckdb": 2.613},
        },
        "results": res,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
