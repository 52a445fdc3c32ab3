"""Round-10 100x adjudications (verdict items 4 + 5), one session,
ENGINES INTERLEAVED so box drift cannot masquerade as a plan delta:

* tpch_q21 / join_role_playing_dates — r8 measured ratios 0.68 / ~1,
  r9 measured 5.1x / 3.3x with Spark FASTER than r8 on both (the
  DuckDB comparator got ~10x faster on identical SQL between rounds).
  Interleave both engines same-session at 100x to decide: box drift or
  a real plan gap.
* analytics_dau_wau — 8.5x at 100x in r9 (7x day-fan-out into a
  two-phase countDistinct). Round 10 re-planned it as interval-merge +
  delta prefix-sum (O(activity), no fan-out, no distinct); this A/B
  measures OLD shape vs NEW shape vs DuckDB on the same fixture.

    python tools/ab_100x_r10.py --out AB_100X_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.schemas import TABLE_NAMES
from appstore_aws_etl_spark.session import get_spark

FIXTURE = "/tmp/bench10x/x100"
KEYS = ("tpch_q21_waiting_supplier", "join_role_playing_dates", "analytics_dau_wau")
DUCK_TIMEOUT_S = 240.0


def dau_wau_old(spark, sf_dir):
    """The r7-r9 shape, reconstructed verbatim for the A/B: 7x day
    fan-out -> broadcast day-spine semijoin -> countDistinct."""
    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.catalog import load

    ev = load(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.col("day").alias("a_day"),
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
    ).select(
        F.expr("a_day + make_interval(0, 0, 0, cast(i AS int))").alias("day"),
        "user_id",
    )
    wau = (
        contrib.join(F.broadcast(days), "day")  # bounded: day spine
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day", "dau", "wau",
        (F.round(F.col("dau") / F.col("wau"), 4) + F.lit(0.0)).alias("stickiness"),
    )


def role_playing_old(spark, sf_dir):
    """The r5-r9 shape: fact-fact join FIRST, calendar broadcasts
    above it — both raw date columns cross the big exchange."""
    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cal = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1992-01-01").cast("date"),
                    F.lit("1998-12-31").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d")
        )
        .select(
            F.col("d").cast("timestamp").alias("date_key"),
            ((F.weekday("d") + 1) >= 6).alias("is_weekend"),
        )
    )
    ocal = cal.select(
        F.col("date_key").alias("o_key"), F.col("is_weekend").alias("ordered_on_weekend")
    )
    scal = cal.select(
        F.col("date_key").alias("s_key"), F.col("is_weekend").alias("shipped_on_weekend")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(ocal), F.date_trunc("day", "o_orderdate") == F.col("o_key"))
        .join(F.broadcast(scal), F.date_trunc("day", "l_shipdate") == F.col("s_key"))
        .select("l_orderkey", "l_linenumber", "ordered_on_weekend", "shipped_on_weekend")
    )


def main() -> int:
    out_path = "AB_100X_local.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if not os.path.exists(os.path.join(FIXTURE, "_done")):
        raise SystemExit("build the 100x fixture first: "
                         "python tools/bench10x.py --factor 100 --only <any>")

    import duckdb

    spark = get_spark(
        "ab_100x_r10",
        shuffle_partitions=64,  # the 100x-tier partition discipline
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )

    def spark_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, FIXTURE).count()
        dt = time.perf_counter() - t0
        release_checkpoints(spark)
        return round(dt, 2)

    def duck_once(sql: str) -> float | None:
        timer = threading.Timer(DUCK_TIMEOUT_S, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        except duckdb.Error:
            return None
        finally:
            timer.cancel()
        return round(time.perf_counter() - t0, 2)

    spark_once(REGISTRY["agg_group"].fn)  # codegen warm

    results: dict[str, dict] = {}
    for key in KEYS:
        spec = REGISTRY[key]
        seq = []
        # warm both engines once, then two timed INTERLEAVED rounds:
        # s, d, s, d — any box-level drift inside the window hits both
        spark_once(spec.fn)
        duck_once(spec.oracle)
        for _ in range(2):
            seq.append(("spark", spark_once(spec.fn)))
            seq.append(("duckdb", duck_once(spec.oracle)))
        sp = [v for e, v in seq if e == "spark"]
        du = [v for e, v in seq if e == "duckdb" and v is not None]
        results[key] = {
            "interleaved": seq,
            "spark_min": min(sp),
            "duckdb_min": min(du) if du else f">= {DUCK_TIMEOUT_S} (capped)",
            "ratio_min": round(min(sp) / min(du), 2) if du else None,
        }
        print(f"{key}: {results[key]}", flush=True)

    # dau_wau OLD shape, same session, interleaved with the new one
    old = []
    new = []
    spark_once(dau_wau_old)  # warm the old plan's codegen
    for _ in range(2):
        old.append(spark_once(dau_wau_old))
        new.append(spark_once(REGISTRY["analytics_dau_wau"].fn))
    results["analytics_dau_wau_old_shape"] = {
        "old_fanout_countdistinct": old,
        "new_interval_prefix_sum": new,
        "speedup_min": round(min(old) / min(new), 2),
    }
    print(f"dau_wau old-vs-new: {results['analytics_dau_wau_old_shape']}", flush=True)

    # role_playing OLD shape (dates through the exchange) vs NEW
    # (pre-exchange weekend flags), same session, interleaved
    rp_old, rp_new = [], []
    spark_once(role_playing_old)
    for _ in range(2):
        rp_old.append(spark_once(role_playing_old))
        rp_new.append(spark_once(REGISTRY["join_role_playing_dates"].fn))
    results["join_role_playing_dates_old_shape"] = {
        "old_dates_through_exchange": rp_old,
        "new_preexchange_flags": rp_new,
        "speedup_min": round(min(rp_old) / min(rp_new), 2),
    }
    print(f"role_playing old-vs-new: "
          f"{results['join_role_playing_dates_old_shape']}", flush=True)

    artifact = {
        "date": "2026-08-15",
        "fixture": FIXTURE,
        "protocol": "warm both engines, then 2x interleaved timed runs "
                    "(spark, duckdb, spark, duckdb) per key; shuffle=64 "
                    "AQE on (the 100x posture); checkpoints released "
                    "between runs",
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
