"""Interleaved A/B: lake driver fixed-cost cuts (new, optimization
round 13 — cached py4j FS handles + incremental snapshot replay) vs the
prior shape (fresh Path-class traversal + getFileSystem per _fs call,
full post-checkpoint tail replay per snapshot()) on the lake keys
(BASELINE.md protocol: same session, alternating runs, medians AND
mins).

The old arm monkey-patches ``log._fs`` (and the copies imported into
``table``/``queries.lakehouse``) with the uncached implementation and
``LakeTable.snapshot`` with the no-base replay call.

    python tools/ab_lakedriver_r13.py --runs 5 --out AB_LAKEDRIVER_r13opt.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.lakehouse import log as lake_log
from appstore_aws_etl_spark.lakehouse import table as lake_table
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEYS = [
    "lake_stream_upsert",
    "lake_compact_identity",
    "lake_merge_upsert",
    "lake_zorder_optimize",
    "lake_stream_ingest",
    "lake_update_dv",
    "lake_scd2_apply",
    "lake_incremental_feed",
    "lake_delete_dv",
    "lake_dedup_ingest",
]

NEW_FS = lake_log._fs
NEW_SNAPSHOT = lake_table.LakeTable.snapshot


def old_fs(spark, path):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def old_snapshot(self, version=None):
    return lake_log.replay(self.spark, self.root, version)


_FS_SITES = [lake_log, lake_table]


def set_variant(which: str) -> None:
    fs = old_fs if which == "old" else NEW_FS
    for mod in _FS_SITES:
        mod._fs = fs
    lake_table.LakeTable.snapshot = (
        old_snapshot if which == "old" else NEW_SNAPSHOT
    )


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = "AB_LAKEDRIVER_r13opt.json"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    spark = get_spark(
        "ab-lakedriver",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()
    REGISTRY["udf_pandas"].fn(spark, SF_DIR).count()

    res: dict[str, dict[str, list[float]]] = {
        k: {"old": [], "new": []} for k in KEYS
    }
    for key in KEYS:
        for variant in ("old", "new"):
            set_variant(variant)
            REGISTRY[key].fn(spark, SF_DIR).count()
            release_checkpoints(spark)
        for _ in range(runs):
            for variant in ("old", "new"):
                set_variant(variant)
                t0 = time.perf_counter()
                REGISTRY[key].fn(spark, SF_DIR).count()
                res[key][variant].append(round(time.perf_counter() - t0, 4))
                release_checkpoints(spark)
    set_variant("new")

    summary = {}
    for key in KEYS:
        o, n = res[key]["old"], res[key]["new"]
        summary[key] = {
            "old_median": round(statistics.median(o), 3),
            "new_median": round(statistics.median(n), 3),
            "old_min": round(min(o), 3),
            "new_min": round(min(n), 3),
            "runs_old": o,
            "runs_new": n,
        }
        print(
            f"{key}: old med {summary[key]['old_median']} min {summary[key]['old_min']}"
            f" -> new med {summary[key]['new_median']} min {summary[key]['new_min']}"
        )
    with open(out, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "runs": runs, "results": summary}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
