"""Interleaved A/B: string-gram exchanges (old) vs xxhash64-fingerprinted
grams + pairs_only candidate mode (new, llm/dedup.ngram_jaccard_pairs) on
the gram-family keys (BASELINE.md protocol: same session, alternating
runs, medians AND mins).

    python tools/ab_grams_r13.py --runs 5 --out AB_GRAMS_r13opt.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
import appstore_aws_etl_spark.queries.llm as qllm
from appstore_aws_etl_spark.ckpt import CHECKPOINT_LEVEL, release_checkpoints
from appstore_aws_etl_spark.llm import dedup
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

KEYS = [
    "llm_jaccard_ngram",
    "llm_containment_pairs",
    "llm_edit_distance_verify",
]

NEW = dedup.ngram_jaccard_pairs


def old_ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    scope_cols: list[str] | None = None,
    df_cap: int | None = None,
    include_containment: bool = False,
    pairs_only: bool = False,
) -> DataFrame:
    """Pre-r13opt variant: string grams through every exchange, always
    computes sizes + ratio joins (pairs_only just projects them away,
    reproducing the old llm_edit_distance_verify call shape)."""
    scope_cols = scope_cols or []
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    gram_arr = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.size(toks))
        gram_arr = F.zip_with(gram_arr, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    gram_arr = F.filter(gram_arr, lambda g: g.isNotNull())
    grams = df.select(
        id_col,
        *scope_cols,
        F.explode(F.array_distinct(gram_arr)).alias("gram"),
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    if df_cap is not None:
        hot = (
            grams.groupBy(*scope_cols, "gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > df_cap)
            .select(*scope_cols, "gram")
        )
        grams = grams.join(
            hot, on=[*scope_cols, "gram"], how="left_anti"
        ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    sizes = grams.groupBy(id_col, *scope_cols).agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(*scope_cols, F.col(id_col).alias("id_a"), "gram")
    b = grams.select(*scope_cols, F.col(id_col).alias("id_b"), "gram")
    inter = (
        a.join(b, on=[*scope_cols, "gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4),
        )
        .withColumn("containment_a", F.round(F.col("n_inter") / F.col("na"), 4))
        .withColumn("containment_b", F.round(F.col("n_inter") / F.col("nb"), 4))
        .select(
            "id_a", "id_b", "n_inter", "jaccard",
            *(["containment_a", "containment_b"] if include_containment else []),
        )
    )
    return out.select("id_a", "id_b") if pairs_only else out


def set_variant(which: str) -> None:
    fn = old_ngram_jaccard_pairs if which == "old" else NEW
    dedup.ngram_jaccard_pairs = fn
    qllm.ngram_jaccard_pairs = fn


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = "AB_GRAMS_r13opt.json"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]

    spark = get_spark(
        "ab-grams",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()
    REGISTRY["udf_pandas"].fn(spark, SF_DIR).count()

    res: dict[str, dict[str, list[float]]] = {k: {"old": [], "new": []} for k in KEYS}
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
