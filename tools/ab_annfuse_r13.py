"""Interleaved A/B: fused Arrow Lloyd rounds + range-literal parameter
relations (new, llm/similarity.py optimization round 13) vs the prior
shape (pandas-UDF assignment -> posexplode -> avg per round; pq_encode
UDF + posexplode per PQ round; createDataFrame parameter tables) on the
ANN training keys (BASELINE.md protocol: same session, alternating
runs, medians AND mins).

The old arm is reconstructed by monkey-patching ``train_centroids`` /
``train_pq`` / ``_param_relation`` with pre-change copies; the new
``lazy_checkpoint`` of the normalized vectors inside ivfpq_knn /
build_ivfpq_index is NOT patchable per-arm, so the old arm also
benefits from it — the measured delta UNDERSTATES the full change.

    python tools/ab_annfuse_r13.py --runs 5 --out AB_ANNFUSE_r13opt.json
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
    "llm_knn_ivf",
    "llm_knn_pq",
    "llm_knn_ivfpq",
    "llm_topic_cluster",
    "llm_knn_ivfpq_refresh",
]

NEW_TRAIN_CENTROIDS = similarity.train_centroids
NEW_TRAIN_PQ = similarity.train_pq
NEW_PARAM_RELATION = similarity._param_relation


def old_train_centroids(df, n_centroids=16, iterations=3, vec_col="embedding", seed=42):
    """Pre-r13opt variant: pandas-UDF assignment + posexplode avg."""
    init = similarity._distinct_seed_sample(df, F.col(vec_col), n_centroids, seed)
    dim = len(init[0])
    centroids = [(i, v) for i, v in enumerate(init)]
    for _ in range(iterations):
        assigned = similarity.assign_to_centroids(df, centroids, vec_col)
        rows = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in rows:
            by_c.setdefault(r["centroid_id"], {})[r["pos"]] = float(r["m"])
        centroids = sorted(
            (cid, [d[p] for p in range(dim)]) for cid, d in by_c.items()
        )
    return centroids


def old_train_pq(df, m=8, k_codes=16, iterations=2, vec_col="embedding",
                 seed=42, normalize=True):
    """Pre-r13opt variant: pq_encode UDF + posexplode avg per round."""
    vec_expr = similarity._normalized(vec_col) if normalize else F.col(vec_col)
    init = similarity._distinct_seed_sample(df, vec_expr, k_codes * 4, seed)
    dim = len(init[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} blocks")
    sub = dim // m
    books = []
    for j in range(m):
        slices = [tuple(v[j * sub:(j + 1) * sub]) for v in init]
        block: list[list[float]] = []
        seen: set[tuple[float, ...]] = set()
        for s in slices:
            if s not in seen:
                seen.add(s)
                block.append(list(s))
            if len(block) == k_codes:
                break
        for s in slices:
            if len(block) == k_codes:
                break
            block.append(list(s))
        books.append(block)
    width = max(len(b) for b in books)
    for b in books:
        while len(b) < width:
            b.append(list(b[-1]))
    for _ in range(iterations):
        enc = similarity.pq_encode(
            df, books, vec_col=vec_col, out_col="__codes", normalize=normalize
        )
        rows = (
            enc.select(
                F.col("__codes").alias("c"),
                F.posexplode(vec_expr).alias("pos", "x"),
            )
            .select(
                F.expr(f"cast(pos / {sub} as int)").alias("blk"),
                F.expr(f"c[cast(pos / {sub} as int)]").alias("code"),
                F.expr(f"pos % {sub}").alias("posw"),
                "x",
            )
            .groupBy("blk", "code", "posw")
            .agg(F.avg("x").alias("mval"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            upd.setdefault((r["blk"], r["code"]), {})[r["posw"]] = float(r["mval"])
        for (j, c), d in upd.items():
            books[j][c] = [d[p] for p in range(sub)]
    return books


def old_param_relation(spark, pairs, id_name, vec_name):
    """Pre-r13opt variant: createDataFrame parameter table."""
    return spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in pairs],
        f"{id_name} LONG, {vec_name} ARRAY<DOUBLE>",
    )


def set_variant(which: str) -> None:
    if which == "old":
        similarity.train_centroids = old_train_centroids
        similarity.train_pq = old_train_pq
        similarity._param_relation = old_param_relation
    else:
        similarity.train_centroids = NEW_TRAIN_CENTROIDS
        similarity.train_pq = NEW_TRAIN_PQ
        similarity._param_relation = NEW_PARAM_RELATION


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = "AB_ANNFUSE_r13opt.json"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    spark = get_spark(
        "ab-annfuse",
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
