"""Round-12 survivors recall-recovery A/B (verdict item 4): cap-64
WITHOUT vs WITH the hot-bucket second-chance pass, on the same two
fixtures AB_SURVIVORS_CAP_r11 graded (x1 scalecheck fixture: 5000 docs
+ the key's 500 planted copies; clique-dense 100x: 500k docs in
100-cliques). r11 reference points: cap-1000 x1_rows 2944 (the recall
ceiling, 453.5 s at x100), cap-64 x1_rows 3380 / x100 54.5 s.

Done-bar: >=90% of cap-1000's x1 removal (x1_rows <= ~3200) at <2x the
cap-64 x100 wall-clock (< ~109 s).

    python tools/ab_survivors_r12.py --out AB_SURVIVORS_r12.json
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.ckpt import CHECKPOINT_LEVEL, release_checkpoints
from appstore_aws_etl_spark.llm.dedup import minhash_near_dup_pairs
from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels
from appstore_aws_etl_spark.session import get_spark

X1 = "/tmp/scalecheck_docs/x1"
# the clique-dense tier AB_SURVIVORS_CAP_r11 graded: the 100x BENCH
# fixture (500k docs, every doc a 100-clique of per-copy-suffixed
# near-dups) — NOT scalecheck_docs/x100 (the adversarial shared-base
# tier, where hot membership is the whole corpus by construction)
X100 = "/tmp/bench10x/x100"

# first r12 experiment, recorded before the mechanism pivot: fresh
# independent-permutation re-banding of hot members recovered only
# x1_rows 3380 -> 3348 (~7% of the 436-doc gap to cap-1000) and read
# 336.8 s on the adversarial shared-base tier — mega-buckets re-form
# under ANY seed because members genuinely share most shingles. The
# shipped mechanism is sorted-neighborhood chaining instead.
SEED_PASS_DEAD_END = {
    "cap64": {"x1_rows": 3380, "x1_s": 10.7, "adversarial_x100_rows": 2371, "adversarial_x100_s": 117.3},
    "cap64_fresh_seed": {"x1_rows": 3348, "x1_s": 13.0, "adversarial_x100_rows": 2320, "adversarial_x100_s": 336.8},
}


def survivors(spark, sf_dir, second_chance: bool):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    offset = docs.agg(F.max("doc_id")).first()[0] + 1
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + F.lit(offset)).alias("doc_id"), "text"
        )
    )
    pairs = minhash_near_dup_pairs(
        aug, jaccard_threshold=0.5, max_bucket_docs=64, second_chance=second_chance
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    und = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    labels = und.groupBy(F.col("src").alias("node")).agg(
        F.least(F.min("dst"), F.min("src")).alias("component")
    )
    labels = propagate_min_labels(und, labels, "node", "component", max_rounds=50)
    losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return aug.join(losers, "doc_id", "left_anti").select("doc_id")


def main() -> None:
    out_path = "AB_SURVIVORS_r12.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    spark = get_spark("ab_survivors_r12", shuffle_partitions=64)
    res: dict[str, dict] = {}
    for name, sc in (("cap64", False), ("cap64_2c", True)):
        survivors(spark, X1, sc).count()  # warm
        release_checkpoints(spark)
        t0 = time.perf_counter()
        n1 = survivors(spark, X1, sc).count()
        e1 = round(time.perf_counter() - t0, 1)
        release_checkpoints(spark)
        res[name] = {"x1_rows": n1, "x1_s": e1}
    for name, sc in (("cap64", False), ("cap64_2c", True)):
        t0 = time.perf_counter()
        n100 = survivors(spark, X100, sc).count()
        e100 = round(time.perf_counter() - t0, 1)
        release_checkpoints(spark)
        res[name]["x100_rows"] = n100
        res[name]["x100_s"] = e100
    out = {
        "date": datetime.date.today().isoformat(),
        "protocol": "one session, local[*] AQE on shuffle=64; x1 warm-then-time, "
        "x100 single timed run per variant, blocking release between runs",
        "r11_reference": {
            "cap_64": {"x1_rows": 3380, "x100_rows": 3587, "x100_s": 54.5},
            "cap_1000": {"x1_rows": 2944, "x100_rows": 2938, "x100_s": 453.5},
        },
        "fresh_seed_dead_end": SEED_PASS_DEAD_END,
        "results": res,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
