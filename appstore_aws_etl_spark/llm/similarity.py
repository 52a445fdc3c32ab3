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

from pyspark.sql import DataFrame, Window
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


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Coarse quantizer: deterministic seeded init + Lloyd iterations
    expressed as join/groupBy (runs fully distributed; centroids stay a
    tiny broadcastable table)."""
    dim_df = df.select(F.size(vec_col).alias("d")).limit(1)
    dim = dim_df.collect()[0]["d"]  # scalar metadata, not data collect
    centroids = (
        df.select(F.col(vec_col).alias("c_vec"))
        .orderBy(F.xxhash64(F.col("c_vec").cast("string"), F.lit(seed)))
        .limit(n_centroids)
        .withColumn("centroid_id", F.monotonically_increasing_id())
    )
    id_col = df.columns[0]
    for _ in range(iterations):
        assigned = _assign(df, centroids, vec_col, id_col)
        centroids = (
            assigned.groupBy("centroid_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"m{i}")
                        for i in range(dim)
                    ]
                ).alias("c_vec")
            )
        )
    return centroids.select("centroid_id", "c_vec")


def _assign(df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Route each vector to its nearest centroid (broadcast join +
    per-row argmax — no shuffle of the big side)."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine_score(F.col(vec_col), F.col("c_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "sim", "c_vec")
    )


def ivf_knn(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """L4 scale path: probe only the ``nprobe`` nearest inverted lists.

    Exactness is traded for the routing approximation; recall vs the
    brute-force baseline is asserted in tests (>=0.7 at these
    parameters on the fixture)."""
    centroids = centroids if centroids is not None else train_centroids(
        df, n_centroids, vec_col=vec_col
    )
    assigned = _assign(df, centroids, vec_col, id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r["centroid_id"]
        for r in centroids.withColumn("sim", cosine_score(F.col("c_vec"), q))
        .orderBy(F.col("sim").desc())
        .limit(nprobe)
        .collect()  # tiny centroid table, not data
    ]
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .withColumn("score", F.round(cosine_score(F.col(vec_col), q), 4) + F.lit(0.0))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
