"""IVFADC residual-path adjudication at corpus-realistic cell counts
(round-10 verdict item 1 "then prove it").

Round 9 shipped the residual computation (normalized vector minus its
cell centroid) as an n_cells-way CASE of dim-wide ARRAY LITERALS; round
10 re-shaped it to a broadcast join on centroid_id. At the bench's
n_cells=16 both are cheap — the literal CASE only becomes a plan-size
scale-killer at deployed cell counts (n_cells ~ sqrt(n)). This tool
measures BOTH shapes at that realistic size on the 100x embeddings
tier (200k vectors, n_cells=450 ~ sqrt(200k)):

  * construction+planning time (build the residual DataFrame, force
    full analysis/physical planning via the explain string) — the cost
    the driver pays PER QUERY before any task runs;
  * one materialization (count) of the residual frame;
  * physical-plan size in characters (the literal payload);
  * full ivfpq_knn end-to-end at n_cells=450 / nprobe=32 plus
    recall@10 vs brute force — showing recall holds at deployed shape.

    python tools/ab_ivfpq_cells.py --out IVFPQ_CELLS_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.session import get_spark

FIXTURE = "/tmp/scalecheck_docs/x100/embeddings.parquet"
N_CELLS = 450
NPROBE = 32


def main() -> int:
    out_path = "IVFPQ_CELLS_local.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.llm.similarity import (
        _normalized,
        assign_to_centroids,
        brute_force_knn,
        ivfpq_knn,
        train_centroids,
    )

    spark = get_spark(
        "ab_ivfpq_cells",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if not os.path.exists(FIXTURE):
        raise SystemExit(
            "run tools/scalecheck_docs.py first (builds the 100x tier)"
        )
    emb = spark.read.parquet(FIXTURE)
    n_rows = emb.count()

    # shared setup: train the coarse quantizer ONCE; the A/B isolates
    # the residual-construction shape, not training
    t0 = time.perf_counter()
    ndf = emb.withColumn("__nvec", _normalized("embedding"))
    cells = train_centroids(ndf, N_CELLS, iterations=2, vec_col="__nvec")
    t_train = time.perf_counter() - t0
    assigned = assign_to_centroids(ndf, cells, "__nvec")

    def measure(build) -> dict:
        t0 = time.perf_counter()
        df = build()
        # ._sc access not needed: explain string forces analysis +
        # optimization + physical planning, the per-query driver cost
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        t_plan = time.perf_counter() - t0
        t1 = time.perf_counter()
        # force the residual projection itself: a bare count() would
        # prune the cardinality-preserving withColumn (and its UDF) on
        # the CASE side while the join side can't be pruned — sum one
        # residual element so both variants evaluate __res end-to-end
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.element_at(F.col("__res"), 1)).alias("chk"),
        ).head()
        t_count = time.perf_counter() - t1
        return {
            "plan_s": round(t_plan, 3),
            "eval_s": round(t_count, 3),
            "rows": row["n"],
            "plan_chars": len(plan),
        }

    def build_case():
        # the round-9 shape, reconstructed verbatim for the A/B:
        # n_cells-way CASE of dim-wide array literals
        cent_case = None
        for cid, vec in sorted(cells):
            arr = F.array(*[F.lit(float(x)) for x in vec])
            cent_case = (
                F.when(F.col("centroid_id") == cid, arr)
                if cent_case is None
                else cent_case.when(F.col("centroid_id") == cid, arr)
            )
        return assigned.withColumn(
            "__res", F.zip_with(F.col("__nvec"), cent_case, lambda a, b: a - b)
        )

    def build_join():
        cells_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in sorted(cells)],
            "centroid_id LONG, __cent ARRAY<DOUBLE>",
        )
        # bounded: n_cells x dim quantizer parameters, not data
        return (
            assigned.join(F.broadcast(cells_df), "centroid_id")
            .withColumn(
                "__res",
                F.zip_with(F.col("__nvec"), F.col("__cent"), lambda a, b: a - b),
            )
            .drop("__cent")
        )

    # join first so the CASE variant can't donate page-cache warmth
    join_m = measure(build_join)
    case_m = measure(build_case)
    release_checkpoints(spark)

    # end-to-end deployed-shape query + recall vs brute force
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    t0 = time.perf_counter()
    approx = {
        r["vec_id"]
        for r in ivfpq_knn(
            emb, qvec, k=10, n_cells=N_CELLS, nprobe=NPROBE, m=8, k_codes=16,
            rerank_factor=5, cells=cells,
        ).collect()
    }
    t_e2e = time.perf_counter() - t0
    release_checkpoints(spark)
    exact = {r["vec_id"] for r in brute_force_knn(emb, qvec, k=10).collect()}
    recall = len(approx & exact) / 10.0

    artifact = {
        "date": "2026-08-15",
        "fixture": FIXTURE,
        "n_rows": n_rows,
        "n_cells": N_CELLS,
        "nprobe": NPROBE,
        "coarse_train_s": round(t_train, 2),
        "residual_literal_case": case_m,
        "residual_broadcast_join": join_m,
        "ivfpq_e2e_s_with_pretrained_cells": round(t_e2e, 2),
        "recall_at_10_vs_brute_force": recall,
        "note": (
            "plan_s = DataFrame construction + full analysis/physical "
            "planning (explain string) — per-query DRIVER cost; the "
            "literal-CASE variant embeds n_cells x dim = "
            f"{N_CELLS * 64} float literals in the expression tree, the "
            "join ships them as a broadcast parameter relation."
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
