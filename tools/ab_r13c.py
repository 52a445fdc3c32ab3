"""Round-13 session-2 A/B: three single-pass re-plans at the 100x tier.

1. analytics_cohort_retention — OLD (groupBy-user + join-back +
   distinct: three wide exchanges) vs NEW (one user-keyed
   collect_set(week) exchange with map-side set dedup, no join).
2. tpch_q14_promo_share — CURRENT (month-filtered fact joined to the
   2M-row part dim) vs PREAGG (fact pre-aggregated to partkey grain
   first — the agg output is MBs, so AQE runtime-broadcasts it and the
   part side never shuffles).
3. ts_seasonal_baseline — WINDOW (r12 plan: one exchange + partition
   sort) vs JOINBACK (grouped baseline + unhinted join-back that AQE
   converts to a runtime broadcast: the event side has ZERO exchange
   and no sort; the r6 disaster shape was the same join WITHOUT AQE).

Interleaved warm+N timed runs per variant, same-session DuckDB
denominators, forced evaluation via the noop sink where count() would
prune the work.

    python tools/ab_r13c.py --out AB_R13C_100X.json
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
from pyspark.sql.window import Window

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")
N_RUNS = int(os.environ.get("AB_RUNS", "5"))


def cohort_old(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id", "cohort_week",
            (F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7)
            .cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def q14_preagg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    by_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(net).alias("net_sum")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = p.join(by_part, p.p_partkey == by_part.partkey)
    promo = F.when(F.col("p_type") == "PROMO", F.col("net_sum")).otherwise(F.lit(0.0))
    return j.agg(F.round(100.0 * F.sum(promo) / F.sum("net_sum"), 4).alias("promo_share"))


def seasonal_joinback(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", "ts", "value", F.hour("ts").cast("long").alias("hr")
    )
    season = base.groupBy("user_id", "hr").agg(
        F.round(F.avg("value"), 4).alias("seasonal")
    )
    j = base.join(season, ["user_id", "hr"])
    return j.select(
        "event_id", "user_id", "hr", "seasonal",
        F.round(F.col("value") - F.col("seasonal"), 4).alias("residual"),
    )


CASES = {
    "analytics_cohort_retention": {
        "variants": {"old_join_distinct": cohort_old,
                     "new_collect_set": REGISTRY["analytics_cohort_retention"].fn},
        "forced": False,
    },
    "tpch_q14_promo_share": {
        "variants": {"current_dim_join": REGISTRY["tpch_q14_promo_share"].fn,
                     "preagg_partkey": q14_preagg},
        "forced": False,
    },
    "ts_seasonal_baseline": {
        "variants": {"window": REGISTRY["ts_seasonal_baseline"].fn,
                     "joinback_aqe": seasonal_joinback},
        "forced": True,
    },
}


def main() -> None:
    out_path = "AB_R13C_100X.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )
    spark = get_spark("ab_r13c", shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    def run(fn, forced):
        t0 = time.perf_counter()
        df = fn(spark, FIXTURE)
        if forced:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        release_checkpoints(spark)
        return round(time.perf_counter() - t0, 3)

    def duck(key, forced):
        agg = "max(hash(t))" if forced else "count(*)"
        t0 = time.perf_counter()
        con.execute(f"SELECT {agg} FROM ({REGISTRY[key].oracle}) t").fetchone()
        return round(time.perf_counter() - t0, 3)

    results = {}
    for key, spec in CASES.items():
        forced = spec["forced"]
        times = {name: [] for name in spec["variants"]}
        dtimes = []
        for name, fn in spec["variants"].items():  # warm every variant first
            run(fn, forced)
        duck(key, forced)
        for _ in range(N_RUNS):
            for name, fn in spec["variants"].items():
                times[name].append(run(fn, forced))
            dtimes.append(duck(key, forced))
        results[key] = {
            "variants": {
                name: {"runs": ts, "median": statistics.median(ts), "min": min(ts)}
                for name, ts in times.items()
            },
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
