"""Round-12 session-2 A/B #2: the co-purchase edge builder that feeds
every graph key (pagerank / kcore / degree_distribution / components /
triangles).

Shipped shape: op = (orderkey, partkey) DISTINCT (exchange 1), then a
self-join of op with itself on orderkey (exchanges 2+3 + the SMJ sort
of the 100x tier's ~60M-row relation twice), then the pair aggregate.

New shape: ONE orderkey exchange — groupBy(l_orderkey).collect_set
(the set dedups within the order, subsuming the DISTINCT), pairs
enumerated JVM-side from the sorted per-order array (nested
transform + flatten, whole-stage codegen; fanout identical to the
join's, bounded by order width), then the same pair aggregate.

    python tools/ab_r12c.py --out AB_EDGES_r12.json [n_runs]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")


def edges_new(spark, sf_dir, min_support):
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair = F.explode(
        F.flatten(
            F.expr(
                "transform(parts, (x, i) -> transform("
                "  slice(parts, i + 2, size(parts) - i - 1),"
                "  y -> struct(x AS src, y AS dst)))"
            )
        )
    ).alias("p")
    return (
        per_order.select(pair)
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_support)
        .select("src", "dst")
    )


def degree_new(spark, sf_dir):
    edges = edges_new(spark, sf_dir, min_support=2)
    und = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    total = Window.partitionBy()
    return hist.select(
        "degree",
        "n_nodes",
        F.round(F.col("n_nodes") * 1.0 / F.sum("n_nodes").over(total), 6).alias(
            "frac_nodes"
        ),
    )


VARIANTS = {
    "degree_old": lambda s, d: REGISTRY["graph_degree_distribution"].fn(s, d),
    "degree_new": degree_new,
}


def main() -> None:
    out_path = "AB_EDGES_r12.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    n = int(args[0]) if args and args[0].isdigit() else 3
    spark = get_spark("ab_r12c", shuffle_partitions=64)
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
