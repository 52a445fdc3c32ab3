"""Similarity search over embedding columns (SURVEY.md §2.11 L3-L5).

Three tiers, all DataFrame-native:

* ``cosine_pairs`` / ``similarity_join`` — exact scores via
  higher-order functions (zip_with dot product in double), candidate
  sets bounded by a scope key so the join is never an open cross join.
* ``brute_force_knn`` — exact top-k against a broadcast query vector:
  one scan, one TakeOrderedAndProject; the correctness baseline.
* ``ivf_knn`` — the 100 TB path: k-means-style coarse quantizer
  (centroids from a deterministic seeded sample, Lloyd iterations as
  DataFrame joins), vectors routed to their nearest centroid partition,
  queries probe only ``nprobe`` inverted lists. Search cost drops by
  ~n_centroids/nprobe versus brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_score(a, b) -> F.Column:
    """Cosine similarity of two array<numeric> columns, computed in
    double regardless of storage precision."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope_col: str | None = "label",
) -> DataFrame:
    """L3 pairwise cosine within a scope key (id_a < id_b)."""
    a = df.select(
        *( [scope_col] if scope_col else [] ),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = df.select(
        *( [scope_col] if scope_col else [] ),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    on = [scope_col] if scope_col else None
    joined = a.join(b, on=on) if on else a.crossJoin(b)
    # + 0.0 collapses IEEE negative zero (engines disagree on round's
    # sign preservation, SURVEY.md §7.4.1)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_score("vec_a", "vec_b"), 4) + F.lit(0.0))
        .select("id_a", "id_b", "cosine")
    )


def similarity_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope_col: str | None = "label",
) -> DataFrame:
    """L5 all pairs above a cosine threshold within a scope."""
    return cosine_pairs(df, id_col, vec_col, scope_col).filter(
        F.col("cosine") >= threshold
    )


def brute_force_knn(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """L4 exact top-k by cosine against one query vector (broadcast as a
    literal array; ties broken by id)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("score", F.round(cosine_score(F.col(vec_col), q), 4) + F.lit(0.0))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


Centroids = list[tuple[int, list[float]]]


def assign_to_centroids(df: DataFrame, centroids: Centroids, vec_col: str) -> DataFrame:
    """Route each vector to its nearest centroid as a *pure projection*:
    the centroid matrix ships with the task closure (the Spark-ML
    broadcast-centers pattern) — no join, no shuffle, no window.

    Dense linear algebra is the one place a vectorized pandas UDF beats
    Catalyst expressions: one numpy matmul per Arrow batch versus a
    k x dim literal expression tree that dominates planning/codegen
    time. Ties resolve to the smallest centroid id (argmax first-hit
    over ascending ids)."""
    ids = np.array([cid for cid, _ in sorted(centroids)])
    mat = np.array([vec for _, vec in sorted(centroids)], dtype="float64")
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    @F.pandas_udf("long")
    def nearest(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy()).astype("float64")
        x_n = x / np.linalg.norm(x, axis=1, keepdims=True)
        return pd.Series(ids[np.argmax(x_n @ mat_n.T, axis=1)])

    return df.withColumn("centroid_id", nearest(F.col(vec_col)))


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    seed: int = 42,
) -> Centroids:
    """Coarse quantizer: deterministic seeded init + Lloyd iterations.

    Each iteration is one map-side assignment projection + one grouped
    aggregation; only the n_centroids x dim means come back to the
    driver (parameters, not data). Cost per iteration is a single scan
    of the vectors — flat to any input size."""
    dim = df.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    init = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("string"), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    centroids: Centroids = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(init)]
    for _ in range(iterations):
        assigned = assign_to_centroids(df, centroids, vec_col)
        rows = (
            assigned.groupBy("centroid_id")
            .agg(
                F.array(
                    *[F.avg(F.element_at(F.col(vec_col), i + 1)) for i in range(dim)]
                ).alias("c_vec")
            )
            .collect()
        )
        centroids = sorted((r["centroid_id"], list(r["c_vec"])) for r in rows)
    return centroids


def _py_cosine(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    return dot / (na * nb)


def ivf_knn(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Centroids | None = None,
) -> DataFrame:
    """L4 scale path: probe only the ``nprobe`` nearest inverted lists.

    In a deployed index the assignment is precomputed and the table is
    partitioned by centroid_id, so a probe prunes partitions at the
    scan; here assignment happens inline. Exactness is traded for the
    routing approximation; recall vs brute force is unit-tested."""
    if centroids is None:
        centroids = train_centroids(df, n_centroids, vec_col=vec_col)
    qv = [float(x) for x in query_vec]
    probe_ids = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-_py_cosine(c[1], qv), c[0])
        )[:nprobe]
    ]
    assigned = assign_to_centroids(df, centroids, vec_col)
    q = F.array(*[F.lit(x) for x in qv])
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .withColumn("score", F.round(cosine_score(F.col(vec_col), q), 4) + F.lit(0.0))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
