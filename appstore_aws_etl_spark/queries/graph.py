"""Graph analytics over the part co-purchase graph.

Nodes are parts; an undirected edge connects two parts that appear in
the same order (the same bounded-fanout pair generation as
``analytics_market_basket``). PageRank runs as unrolled power
iterations — each iteration is one join + one grouped aggregation, the
exact Pregel/GraphX message-passing shape expressed in DataFrames, so
Catalyst handles partial aggregation and AQE handles skewed hubs. The
iteration count is fixed (3) so the query — and its DuckDB oracle — is
a static plan.

Scale: edges/degrees are computed once and reused; every iteration
shuffles on the destination key only. Contribution sums are
order-nondeterministic in the last bits, so the published score is
rounded at 1e-9 (float noise is ~1e-15 relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

_DAMP = 0.85


def _iter_sql(prev: str) -> str:
    return f"""
        SELECT e.dst AS node, 0.15 / max(nn.n) + 0.85 * sum(p.pr / dg.d) AS pr
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN deg dg ON dg.src = e.src
        CROSS JOIN n nn
        GROUP BY e.dst"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), deg AS (
        SELECT src, count(*) AS d FROM edges GROUP BY src
    ), n AS (
        SELECT count(*) AS n FROM deg
    ), pr0 AS (
        SELECT src AS node, 1.0 / nn.n AS pr FROM deg CROSS JOIN n nn
    ), pr1 AS ({_iter_sql("pr0")}
    ), pr2 AS ({_iter_sql("pr1")}
    ), pr3 AS ({_iter_sql("pr2")}
    )
    SELECT node, round(pr, 9) AS pr FROM pr3
    """,
    tags=("graph", "iterative", "custom-operator"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) on the co-purchase
    graph. The undirected edge set guarantees every node has both in-
    and out-edges, so there is no dangling-mass correction term."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # cache the JOINED message relation, not the bare edge list: the
    # unrolled 3-iteration DAG references it three times, and caching
    # edges alone still re-runs the edges-deg join per iteration
    messages = edges.join(deg, "src").cache()
    n_nodes = messages.select("src").distinct().count()  # parameter-only collect
    pr = deg.select(F.col("src").alias("node"), (F.lit(1.0) / F.lit(float(n_nodes))).alias("pr"))
    for _ in range(3):
        pr = (
            messages.join(pr, messages.src == pr.node)
            .groupBy(F.col("dst"))
            .agg((F.lit(0.15 / n_nodes) + F.lit(_DAMP) * F.sum(F.col("pr") / F.col("d"))).alias("pr"))
            .select(F.col("dst").alias("node"), "pr")
        )
    return pr.select("node", F.round("pr", 9).alias("pr"))
