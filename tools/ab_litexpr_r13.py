"""Interleaved A/B: per-element F.lit literal arrays (old) vs one-call
F.expr string literals (new, similarity.lit_num_array/_matrix) on the
ANN key family (BASELINE.md protocol: same session, alternating runs,
medians AND mins).

    python tools/ab_litexpr_r13.py --runs 5 --out AB_LITEXPR_r13opt.json
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
from appstore_aws_etl_spark.llm import similarity
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEYS = [
    "llm_knn_ivfpq_probe",
    "llm_knn_ivfpq_compact",
    "llm_knn_ivfpq_delete",
    "llm_knn_ivfpq_refresh",
    "llm_knn_pq",
    "llm_knn_ivf",
    "llm_knn_ivfpq",
    "llm_knn_rerank",
    "llm_knn",
]

NEW_ARRAY = similarity.lit_num_array
NEW_MATRIX = similarity.lit_num_matrix


def old_array(vals):
    return F.array(*[F.lit(v) for v in vals])


def old_matrix(rows):
    return F.array(*[F.array(*[F.lit(v) for v in row]) for row in rows])


def set_variant(which: str) -> None:
    if which == "old":
        similarity.lit_num_array = old_array
        similarity.lit_num_matrix = old_matrix
    else:
        similarity.lit_num_array = NEW_ARRAY
        similarity.lit_num_matrix = NEW_MATRIX


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = "AB_LITEXPR_r13opt.json"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    spark = get_spark(
        "ab-litexpr",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()
    REGISTRY["udf_pandas"].fn(spark, SF_DIR).count()

    res: dict[str, dict[str, list[float]]] = {
        k: {"old": [], "new": []} for k in KEYS
    }
    for key in KEYS:
        # warm both variants once (codegen + index build under CACHE_DIR)
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
