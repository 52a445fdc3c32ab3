"""Scale check: lakehouse DML cost must track FILES TOUCHED, not table
size (the 100 TB design claim in lakehouse/table.py).

Protocol: at each tier (1x / 10x / 100x of sf0.1 customer) build a lake
table from 8 appended batches clustered on c_nationkey, then apply the
SAME fixed-size trickle batch twice:

* merge of 1,000 updated rows spread over every nationkey (worst-case
  file touch for a trickle), timed;
* delete of ONE nationkey's negative-balance rows (stats-prunable),
  timed, with rewritten-file counts recorded.

Pass = trickle-merge wall time grows FAR slower than the 100x data
growth (file-subset rewrite + KB commit, not table rewrite), and the
delete's rewritten-file count stays the stats-pruned subset at every
tier.

    python tools/scalecheck_lake.py --out SCALECHECK_LAKE_r13.json
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.lakehouse import LakeTable
from appstore_aws_etl_spark.session import get_spark

BASE = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/scalecheck_lake"
TIERS = [1, 10, 100]
OFF = 10_000_000


def main() -> None:
    out_path = "SCALECHECK_LAKE_r13.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("scalecheck_lake", shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    cust = load(spark, BASE, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    results = {}
    for tier in [TIERS[0]] + TIERS:  # first pass is a discarded JVM warm-up
        root = f"{ROOT}/x{tier}"
        shutil.rmtree(root, ignore_errors=True)
        copies = [
            cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * OFF))
            for i in range(tier)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionAll(c)
        t = LakeTable.create(spark, root, cust.schema, cluster_by=["c_nationkey"],
                             stats_cols=["c_nationkey", "c_custkey"])
        # monotone-key ingest: 8 contiguous custkey ranges, like batches
        # of ever-increasing ids — each append's files get tight custkey
        # stats for free, which is what makes merge-by-key prunable
        dense = (F.col("c_custkey") / OFF).cast("long") * 15000 + (
            F.col("c_custkey") % OFF
        )
        span = tier * 15000
        for part in range(8):
            lo, hi = part * span // 8, (part + 1) * span // 8
            t.append(big.filter((dense > lo) & (dense <= hi)))
        n_files = len(t.snapshot().files)
        n_rows = t.scan().count()

        # range-LOCAL trickle: the newest 1000 keys (the steady-state
        # upsert shape) — the source range prunes discovery + insert
        # detection to the newest append's files before any read
        # materialize the arriving batch (a real trickle IS a landed
        # file, and an unmaterialized 100-way-union source would be
        # re-evaluated by every merge subplan, measuring the fixture
        # instead of the merge)
        newest_plan = big.filter(
            F.col("c_custkey") > (tier - 1) * OFF + 14000
        ).limit(1000).withColumn("c_acctbal", F.round(F.col("c_acctbal") + 2, 2))
        newest_plan.write.mode("overwrite").parquet(f"{ROOT}/batch_local_x{tier}")
        newest = spark.read.parquet(f"{ROOT}/batch_local_x{tier}")
        snap_now = t.snapshot()
        cand = t._prune_by_source_range(snap_now.files, newest, ["c_custkey"], snap_now)
        t0 = time.perf_counter()
        t.merge(newest, keys=["c_custkey"])
        merge_local_s = round(time.perf_counter() - t0, 3)
        local_cand, files_now = len(cand), len(snap_now.files)

        # fixed-size trickle merge: 1000 rows, warm once on a disjoint set
        batch_plan = big.filter((F.col("c_custkey") % 9973 == 0)).limit(1000).withColumn(
            "c_acctbal", F.round(F.col("c_acctbal") + 1, 2)
        )
        batch_plan.write.mode("overwrite").parquet(f"{ROOT}/batch_scatter_x{tier}")
        batch = spark.read.parquet(f"{ROOT}/batch_scatter_x{tier}")
        t0 = time.perf_counter()
        t.merge(batch, keys=["c_custkey"])
        merge_s = round(time.perf_counter() - t0, 3)

        # stats-prunable delete: one nationkey
        files_before = {f.path for f in t.snapshot().files}
        t0 = time.perf_counter()
        t.delete_where("c_nationkey = 7 AND c_acctbal < 0")
        delete_s = round(time.perf_counter() - t0, 3)
        files_after = {f.path for f in t.snapshot().files}
        rewritten = len(files_before - files_after)

        results[f"x{tier}"] = {  # the warm-up's x1 entry is overwritten
            "rows": n_rows, "files": n_files,
            "merge_1000_rows_s": merge_s,
            "merge_local_1000_rows_s": merge_local_s,
            "merge_local_candidate_files": local_cand,
            "merge_local_total_files": files_now,
            "delete_one_nation_s": delete_s,
            "delete_files_rewritten": rewritten,
            "delete_files_total": len(files_before),
        }
        print(f"x{tier}", json.dumps(results[f"x{tier}"]), flush=True)

    g = results["x100"]["merge_1000_rows_s"] / max(results["x1"]["merge_1000_rows_s"], 1e-9)
    gl = (results["x100"]["merge_local_1000_rows_s"]
          / max(results["x1"]["merge_local_1000_rows_s"], 1e-9))
    out = {
        "date": datetime.date.today().isoformat(),
        "claim": "trickle DML cost tracks files touched, not table size",
        "merge_time_growth_at_100x_data": round(g, 2),
        "merge_local_time_growth_at_100x_data": round(gl, 2),
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"merge_time_growth_at_100x_data": out["merge_time_growth_at_100x_data"]}))
    spark.stop()


if __name__ == "__main__":
    main()
