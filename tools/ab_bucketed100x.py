"""Round-13 item #1: wall-clock the orderkey-bucketed tier at 100x.

BASELINE.md's ORDERKEY_AGG_FLOOR / ORDERKEY_JOIN_FLOOR adjudications
say: the 2-3x residue on tpch q3/q4/q10/q12/q18 at the ad-hoc 100x
tier is the price of ONE orderkey exchange over 60M lineitem rows, and
a deployment running these joins recurringly would pay that shuffle
once at write time by bucketing orders+lineitem on orderkey
(io/bucketing.py; both-exchange elision is plan-asserted in
tests/test_scale.py). That claim was an argument, not an artifact —
this tool measures it.

Protocol (memory/spark-engine-round-state): ONE session, every variant
interleaved, warm pass then N timed rounds, medians AND mins reported.
The bucketed variants are THE SAME registry functions — the only delta
is catalog.BUCKETED_OVERRIDES mapping orders/lineitem to the bucketed
catalog tables, i.e. exactly what a deployment would flip. Plans are
snapshotted per variant and the Exchange count recorded, so the
artifact shows both the wall-clock and WHY (exchanges gone).

Bucketed build: 32 buckets on the orderkey column of each fact,
sorted within buckets; written from catalog.load output so the NTZ
normalization is baked in. Build time is reported separately — it is
the once-per-ingest cost the floor constants amortize.

    python tools/ab_bucketed100x.py --out AB_BUCKETED100X_r13.json [n]
"""

from __future__ import annotations

import datetime
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark import catalog
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.io.bucketing import write_bucketed
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")
WAREHOUSE = os.environ.get("AB_WAREHOUSE", "/tmp/bucketed100x_wh")
N_BUCKETS = int(os.environ.get("AB_BUCKETS", "32"))
# AB_MODE selects the bucket key family: "orderkey" (the
# orders x lineitem fact-fact floor keys) or "custkey" (the
# customer x orders keys — q13's two-exchange floor, q22's anti join)
MODE = os.environ.get("AB_MODE", "orderkey")
if MODE == "orderkey":
    KEYS = [
        "tpch_q3_shipping_priority",
        "tpch_q4_priority_exists",
        "tpch_q10_returned_items",
        "tpch_q12_late_lines",
        "tpch_q18_large_orders",
        # r13 readjud additions — both are orderkey-clustered:
        # join_multikey self-joins lineitem on (orderkey, linenumber)
        # and HashPartitioning(orderkey) satisfies the pair clustering
        # (subset rule); degree_distribution's distinct + pair
        # self-join cluster on orderkey the same way.
        "join_multikey",
        "graph_degree_distribution",
    ]
    BUCKET_TABLES = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
    SUFFIX = "b"
else:
    KEYS = ["tpch_q13_customer_distribution", "tpch_q22_dormant_customers"]
    BUCKET_TABLES = {"orders": "o_custkey", "customer": "c_custkey"}
    SUFFIX = "bc"
OVERRIDES = {t: f"{t}_{SUFFIX}{N_BUCKETS}" for t in BUCKET_TABLES}


def build_bucketed(spark) -> float:
    """Write the bucketed tables once; returns build seconds (0.0 if
    the catalog already has them from this process)."""
    existing = {t.name for t in spark.catalog.listTables()}
    if set(OVERRIDES.values()) <= existing:
        return 0.0
    # the metastore is in-memory per process but the warehouse dir is
    # not: a prior process's managed-table files orphan the location
    # and saveAsTable refuses (LOCATION_ALREADY_EXISTS) — clear them.
    import shutil

    for t in OVERRIDES.values():
        shutil.rmtree(os.path.join(WAREHOUSE, t), ignore_errors=True)
    t0 = time.perf_counter()
    for name, key in BUCKET_TABLES.items():
        df = catalog.load(spark, FIXTURE, name)
        # pre-repartition on the key with the bucket count: Spark's
        # repartition hash == the bucket hash (murmur3), so each task
        # owns exactly one bucket and writes one file per bucket
        # instead of numTasks x numBuckets shards.
        from pyspark.sql import functions as F

        write_bucketed(
            df.repartition(N_BUCKETS, F.col(key)),
            OVERRIDES[name],
            bucket_by=key,
            num_buckets=N_BUCKETS,
            sort_by=[key],
        )
    return round(time.perf_counter() - t0, 2)


def exchange_count(df) -> int:
    from appstore_aws_etl_spark.plans import formatted_plan

    return len(re.findall(r"\bExchange\b", formatted_plan(df)))


def main() -> None:
    out_path = "AB_BUCKETED100X_r13.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    n = int(args[0]) if args else 5

    spark = get_spark(
        "ab_bucketed100x",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.warehouse.dir": WAREHOUSE,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    build_s = build_bucketed(spark)

    def run(key: str, bucketed: bool) -> "tuple[float, int]":
        catalog.BUCKETED_OVERRIDES.clear()
        if bucketed:
            catalog.BUCKETED_OVERRIDES.update(OVERRIDES)
        try:
            t0 = time.perf_counter()
            cnt = REGISTRY[key].fn(spark, FIXTURE).count()
            return round(time.perf_counter() - t0, 2), cnt
        finally:
            catalog.BUCKETED_OVERRIDES.clear()
            release_checkpoints(spark)

    variants = [(k, b) for k in KEYS for b in (False, True)]
    rows: dict[str, int] = {}
    exchanges: dict[str, int] = {}
    for key, bucketed in variants:  # warm + plan snapshot + row parity
        vname = f"{key}{'_bucketed' if bucketed else '_adhoc'}"
        catalog.BUCKETED_OVERRIDES.clear()
        if bucketed:
            catalog.BUCKETED_OVERRIDES.update(OVERRIDES)
        try:
            df = REGISTRY[key].fn(spark, FIXTURE)
            exchanges[vname] = exchange_count(df)
            rows[vname] = df.count()
        finally:
            catalog.BUCKETED_OVERRIDES.clear()
            release_checkpoints(spark)

    times: dict[str, list[float]] = {f"{k}{s}": [] for k in KEYS for s in ("_adhoc", "_bucketed")}
    for _ in range(n):
        for key, bucketed in variants:
            vname = f"{key}{'_bucketed' if bucketed else '_adhoc'}"
            t, _cnt = run(key, bucketed)
            times[vname].append(t)

    # same-session DuckDB oracle timings: the 100x sweep artifacts are
    # from other sessions on a box that swings ±60% within a day — the
    # weak-key adjudication needs the denominator measured in the SAME
    # hour as the bucketed numerator.
    duck: dict[str, list[float]] = {}
    import duckdb

    from appstore_aws_etl_spark.schemas import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )
    for key in KEYS:
        sql = REGISTRY[key].oracle
        con.execute(f"SELECT count(*) FROM ({sql})").fetchone()  # warm
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
            runs.append(round(time.perf_counter() - t0, 2))
        duck[key] = runs
    con.close()

    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "warehouse": WAREHOUSE,
        "build_bucketed_s": build_s,
        "duckdb_times": duck,
        "duckdb_median": {k: statistics.median(v) for k, v in duck.items()},
        "config": f"local[*] AQE on shuffle=64, {N_BUCKETS} buckets on orderkey, "
        f"warm+plan pass then {n} timed rounds interleaved",
        "rows": rows,
        "plan_exchanges": exchanges,
        "times": times,
        "median": {v: statistics.median(ts) for v, ts in times.items()},
        "min": {v: min(ts) for v, ts in times.items()},
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
