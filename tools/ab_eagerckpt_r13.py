"""Interleaved A/B: eager materialization of the multi-consumer
checkpoints (minhash signatures, labelprop edge relation — new,
optimization round 13) vs the prior lazy-everywhere policy, on the keys
whose round-1 broadcast futures raced to first-materialize them
(BASELINE.md protocol: same session, alternating runs, medians AND
mins).

The old arm monkey-patches ``DataFrame.localCheckpoint`` to force
``eager=False`` — every call site in the package passes ``eager``
explicitly, and the only ``eager=True`` sites are the two this change
introduced, so the patch reproduces the pre-change execution exactly.

    python tools/ab_eagerckpt_r13.py --runs 5 --out AB_EAGERCKPT_r13opt.json
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
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark
from pyspark.sql import DataFrame

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEYS = [
    "llm_dedup_survivors",
    "graph_connected_components",
    "llm_dedup_minhash",
]

_ORIG_LC = DataFrame.localCheckpoint


def _lazy_lc(self, eager=True, storageLevel=None):
    return _ORIG_LC(self, eager=False, storageLevel=storageLevel)


def set_variant(which: str) -> None:
    DataFrame.localCheckpoint = _lazy_lc if which == "old" else _ORIG_LC


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = "AB_EAGERCKPT_r13opt.json"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    spark = get_spark(
        "ab-eagerckpt",
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
