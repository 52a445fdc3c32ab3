"""Round-13 item #5: re-probe sub_recursive_hierarchy (6.2x at 100x,
the largest surviving ratio) now that the r11/r12 loop already has the
shrinking frontier, per-round lazy checkpoint + single count job, and
the broadcast flip.

What is actually left in the plan: ONE full-width round (the 100x
fixture's offset copies make ~99% of nodes stop at their first absent
ancestor), i.e. a 2M x 2M self left-join, then kilobyte rounds. The
untried lever is that join's strategy: it runs as SMJ (sort both
sides); a shuffle_hash hint builds on the 4-long-column `up` side and
skips both sorts. Probe old vs hinted, interleaved, one session.

    python tools/ab_rechier_r13.py --out AB_RECHIER_r13.json [n]
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.ckpt import CHECKPOINT_LEVEL, release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")


def rechier_shj(spark, sf_dir):
    """sub_recursive_hierarchy with a shuffle_hash hint on the wide
    round's compose join (build side = `up`, 4 long columns)."""
    part = load(spark, sf_dir, "part")
    ptr0 = part.filter(F.col("p_partkey") > 0).select(
        F.col("p_partkey").alias("node"),
        F.floor((F.col("p_partkey") - 1) / 7).cast("long").alias("anc"),
        F.lit(1).cast("long").alias("depth"),
        F.when(F.floor((F.col("p_partkey") - 1) / 7) == 0, F.col("p_partkey")).alias(
            "top_branch"
        ),
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    done_frames = [ptr0.filter(F.col("anc") == 0)]
    live = ptr0.filter(F.col("anc") > 0)
    live_n = live.count()
    _BCAST_FRONTIER = 200_000
    for _round in range(64):
        if live_n == 0:
            break
        up = live
        for f in done_frames:
            up = up.unionByName(f)
        up = up.select(
            F.col("node").alias("jnode"),
            F.col("anc").alias("janc"),
            F.col("depth").alias("jdepth"),
            F.col("top_branch").alias("jtb"),
        )
        if live_n <= _BCAST_FRONTIER:
            adv = up.join(F.broadcast(live), live.anc == up.jnode, "inner")
            stepped = adv.select(
                "node",
                F.col("janc").alias("anc"),
                (F.col("depth") + F.col("jdepth")).alias("depth"),
                F.coalesce("top_branch", "jtb").alias("top_branch"),
            ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
            missed = live.join(
                F.broadcast(stepped.select(F.col("node").alias("__hit"))),
                live.node == F.col("__hit"),
                "left_anti",
            )
            done_frames.append(missed)
            newly_done = stepped.filter(F.col("anc") == 0)
            live = stepped.filter(F.col("anc") > 0)
        else:
            hit = F.col("jnode").isNotNull()
            stepped = live.join(
                up.hint("shuffle_hash"), live.anc == up.jnode, "left"
            ).select(
                "node",
                F.when(hit, F.col("janc")).otherwise(F.col("anc")).alias("anc"),
                F.when(hit, F.col("depth") + F.col("jdepth"))
                .otherwise(F.col("depth"))
                .alias("depth"),
                F.coalesce("top_branch", F.when(hit, F.col("jtb"))).alias(
                    "top_branch"
                ),
                hit.alias("__advanced"),
            ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
            done_frames.append(
                stepped.filter(~F.col("__advanced") | (F.col("anc") == 0)).drop(
                    "__advanced"
                )
            )
            newly_done = None
            live = stepped.filter(F.col("__advanced") & (F.col("anc") > 0)).drop(
                "__advanced"
            )
        if newly_done is not None:
            done_frames.append(newly_done)
        live_n = live.count()
    else:
        raise RuntimeError("no fixpoint")
    out = done_frames[0]
    for f in done_frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "node",
        "depth",
        F.coalesce("top_branch", F.when(F.col("anc") > 0, F.col("anc")), F.col("node"))
        .alias("top_branch"),
    ).orderBy("node")


def main() -> None:
    out_path = "AB_RECHIER_r13.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    n = int(args[0]) if args else 5
    spark = get_spark(
        "ab_rechier",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    variants = {
        "old": REGISTRY["sub_recursive_hierarchy"].fn,
        "shj": rechier_shj,
    }
    rows = {}
    for name, fn in variants.items():
        rows[name] = fn(spark, FIXTURE).count()
        release_checkpoints(spark)
    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(n):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, FIXTURE).count()
            times[name].append(round(time.perf_counter() - t0, 2))
            release_checkpoints(spark)
    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "rows": rows,
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
