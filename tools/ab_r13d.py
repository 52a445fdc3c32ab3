"""Round-13 session-2 A/B #2: two more >2x-band keys at the 100x tier.

1. sub_lateral_topk — DECORRELATED WINDOW (Catalyst's plan for the
   LATERAL: row_number over orders partitioned by custkey, filter
   rn<=2, join customer) vs AGG TOP-K (slice(sort_array(collect_list(
   struct))) — hash aggregate with map-side partial list merge, no
   per-partition sort of the whole fact).
2. tpch_q15_top_supplier — CURRENT (supplier joined to the full
   100k-row per-supplier revenue relation, THEN filtered by the scalar
   max) vs FILTER-FIRST (revenue filtered to the argmax rows — usually
   1 — before the supplier join, which AQE then runtime-broadcasts:
   the 1M-row supplier side never shuffles).

Same protocol as ab_r13c: interleaved warm + N timed runs, same-session
DuckDB denominators.

    python tools/ab_r13d.py --out AB_R13D_100X.json
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
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.session import get_spark

from pyspark.sql import functions as F

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")
N_RUNS = int(os.environ.get("AB_RUNS", "5"))


def lateral_agg_topk(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    top2 = (
        o.groupBy("o_custkey")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(
                        (-F.col("o_totalprice")).alias("neg_price"),
                        F.col("o_orderkey").alias("o_orderkey"),
                    ))
                ),
                1, 2,
            ).alias("top")
        )
        .select("o_custkey", F.explode("top").alias("t"))
        .select(
            "o_custkey",
            F.col("t.o_orderkey").alias("o_orderkey"),
            F.round(-F.col("t.neg_price"), 2).alias("o_totalprice"),
        )
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return c.join(top2, c.c_custkey == top2.o_custkey).select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


def q15_filter_first(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(net), 2).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("mx"))
    # bounded: 1-row global max
    best = rev.join(F.broadcast(top), F.col("total_rev") == F.col("mx"))
    s = load(spark, sf_dir, "supplier")
    return s.join(best, s.s_suppkey == best.suppkey).select(
        "s_suppkey", "s_name", "total_rev"
    )


CASES = {
    "sub_lateral_topk": {
        "variants": {"window_decorrelated": REGISTRY["sub_lateral_topk"].fn,
                     "agg_topk": lateral_agg_topk},
    },
    "tpch_q15_top_supplier": {
        "variants": {"join_then_filter": REGISTRY["tpch_q15_top_supplier"].fn,
                     "filter_first": q15_filter_first},
    },
}


def main() -> None:
    out_path = "AB_R13D2_100X.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )
    spark = get_spark("ab_r13d", shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, FIXTURE).count()
        release_checkpoints(spark)
        return round(time.perf_counter() - t0, 3)

    def duck(key):
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({REGISTRY[key].oracle}) t").fetchone()
        return round(time.perf_counter() - t0, 3)

    results = {}
    for key, spec in CASES.items():
        for fn in spec["variants"].values():
            run(fn)
        duck(key)
        times = {name: [] for name in spec["variants"]}
        dtimes = []
        for _ in range(N_RUNS):
            for name, fn in spec["variants"].items():
                times[name].append(run(fn))
            dtimes.append(duck(key))
        results[key] = {
            "variants": {n: {"runs": ts, "median": statistics.median(ts),
                             "min": min(ts)} for n, ts in times.items()},
            "duckdb": {"runs": dtimes, "median": statistics.median(dtimes),
                       "min": min(dtimes)},
        }
        print(key, json.dumps(results[key]), flush=True)

    with open(out_path, "w") as fh:
        json.dump({"date": datetime.date.today().isoformat(), "fixture": FIXTURE,
                   "n_runs": N_RUNS, "results": results}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
