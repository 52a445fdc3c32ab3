"""Round-11 interleaved A/B adjudications at the 100x tier (verdict
item 6 / burn-down): OLD shape vs NEW shape in one session, variants
interleaved so box drift hits both equally.

* llm_contamination — r10 shape (string grams + checkpoint + sizes
  groupBy) vs r11 shape (xxhash64 gram fingerprints, row-wise n_grams).
* sub_recursive_hierarchy — r10 shape (full-relation pointer doubling,
  whole-map re-checkpoint + count per round) vs r11 shape (shrinking
  frontier, broadcast compose once the counted frontier fits).

Protocol mirrors bench10x: local[*], AQE on, shuffle=64, warm run per
variant then N timed runs interleaved; blocking checkpoint release
between runs. One JSON line + a dated artifact.

    python tools/ab_r11.py --out AB_R11_100X.json [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.ckpt import CHECKPOINT_LEVEL, release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")


def contamination_old(spark, sf_dir):
    """The r7-r10 shape, reconstructed verbatim: string gram keys,
    shared lazy checkpoint, separate sizes groupBy."""
    from appstore_aws_etl_spark.llm.sampling import key_hash

    df = load(spark, sf_dir, "documents")
    id_col, text_col, n = "doc_id", "text", 5
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    gram_arr = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.size(toks))
        gram_arr = F.zip_with(gram_arr, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    gram_arr = F.filter(gram_arr, lambda g: g.isNotNull())
    grams = df.select(
        id_col,
        key_hash(id_col).alias("__bucket"),
        F.explode(F.array_distinct(gram_arr)).alias("gram"),
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    train_grams = grams.filter(F.col("__bucket") < 8000).select("gram").distinct()
    test_grams = grams.filter(F.col("__bucket") >= 9000)
    shared = (
        test_grams.join(train_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = test_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        shared.join(sizes, id_col)
        .withColumn("ratio", F.round(F.col("n_shared") / F.col("n_grams"), 4))
        .select(id_col, "n_shared", "n_grams", "ratio")
    )


def hierarchy_old(spark, sf_dir):
    """The r9-r10 shape, reconstructed verbatim: every round re-joins,
    re-checkpoints and re-counts the FULL relation."""
    part = load(spark, sf_dir, "part")
    ptr = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("node"),
        F.floor((F.col("p_partkey") - 1) / 7).cast("long").alias("anc"),
        F.lit(1).cast("long").alias("depth"),
        F.when(F.floor((F.col("p_partkey") - 1) / 7) == 0, F.col("p_partkey")).alias(
            "top_branch"
        ),
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    for _round in range(64):
        up = ptr.select(
            F.col("node").alias("jnode"),
            F.col("anc").alias("janc"),
            F.col("depth").alias("jdepth"),
            F.col("top_branch").alias("jtb"),
        )
        live = (F.col("anc") > 0) & F.col("jnode").isNotNull()
        stepped = ptr.join(up, ptr.anc == up.jnode, "left").select(
            "node",
            F.when(live, F.col("janc")).otherwise(F.col("anc")).alias("anc"),
            F.when(live, F.col("depth") + F.col("jdepth"))
            .otherwise(F.col("depth"))
            .alias("depth"),
            F.coalesce("top_branch", F.when(live, F.col("jtb"))).alias("top_branch"),
            live.alias("__advanced"),
        ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
        advanced = stepped.filter(F.col("__advanced")).count()
        ptr = stepped.drop("__advanced")
        if advanced == 0:
            break
    return ptr.select(
        "node",
        "depth",
        F.coalesce("top_branch", F.when(F.col("anc") > 0, F.col("anc")), F.col("node"))
        .alias("top_branch"),
    ).orderBy("node")


VARIANTS = {
    "contamination_old": contamination_old,
    "contamination_new": lambda spark, d: REGISTRY["llm_contamination"].fn(spark, d),
    "hierarchy_old": hierarchy_old,
    "hierarchy_new": lambda spark, d: REGISTRY["sub_recursive_hierarchy"].fn(spark, d),
}


def main() -> None:
    out_path = "AB_R11_100X.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    n = int(args[0]) if args else 3
    spark = get_spark("ab_r11", shuffle_partitions=64)
    rows = {}
    for name, fn in VARIANTS.items():  # untimed warm per variant
        rows[name] = fn(spark, FIXTURE).count()
        release_checkpoints(spark)
    times: dict[str, list[float]] = {v: [] for v in VARIANTS}
    for _ in range(n):
        for name, fn in VARIANTS.items():
            t0 = time.perf_counter()
            fn(spark, FIXTURE).count()
            times[name].append(round(time.perf_counter() - t0, 2))
            release_checkpoints(spark)
    med = {v: sorted(ts)[len(ts) // 2] for v, ts in times.items()}
    import datetime

    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "config": "local[*] AQE on shuffle=64, warm per variant then "
        f"{n} timed runs interleaved, blocking release between runs",
        "rows": rows,
        "times": times,
        "median": med,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
