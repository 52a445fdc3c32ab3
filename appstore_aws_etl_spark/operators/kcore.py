"""k-core decomposition by iterative peeling (SURVEY.md §4.2 "custom
operators" — the third iterative graph primitive beside min-label
propagation and unrolled power iteration).

The k-core is the maximal subgraph where every node has degree >= k.
Peeling computes it as a fixpoint: repeatedly delete nodes with degree
< k (deleting a node lowers its neighbors' degrees, which can cascade).
Each round is ONE grouped degree count + TWO semi-joins against the
surviving node set — no driver-side data, only the convergence counter
crosses to the driver. Rounds needed = peel depth of the graph, and
each round shrinks the edge set monotonically, so the work per round
decreases; localCheckpoint truncates the growing lineage exactly like
operators/labelprop.py.

Not SQL-expressible as a recursive CTE (the recursive term would need
a GROUP BY over itself, which recursive SQL forbids), so the query key
is rows-only; correctness is property-tested against a sequential peel
(tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..ckpt import CHECKPOINT_LEVEL


def kcore_nodes(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    assume_simple: bool = False,
) -> DataFrame:
    """Nodes of the k-core of an UNDIRECTED graph given as a symmetric
    edge list (both directions present). Returns (node, degree) with
    each survivor's within-core degree. Raises RuntimeError if the
    fixpoint is not reached within ``max_rounds`` (peel depth > rounds
    — raise the cap) rather than returning a half-peeled subgraph."""
    # k-core is defined on SIMPLE graphs: collapse parallel edges up
    # front so degree means #distinct neighbors (a caller handing in a
    # multigraph — e.g. both directions of the same pair plus its
    # mirror — would otherwise double-count degrees and under-peel;
    # hypothesis found exactly that input). assume_simple=True skips
    # the dedup shuffle when the caller can PROVE simplicity (e.g. a
    # distinct canonical src<dst set unioned with its mirror — the two
    # halves are disjoint by construction).
    alive = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_simple:
        alive = alive.distinct()
    # Convergence probe = EDGE count, not distinct-node count: every alive
    # node appears as src of >= 1 edge, so peeling a node strictly removes
    # edges and the edge count stabilizes iff the node set does. nxt.count()
    # doubles as the localCheckpoint materialization — exactly ONE Spark job
    # per peel round, no distinct shuffle, and no seed job before the loop
    # (prev_edges=None treats round 1 as always-unconverged).
    prev_edges: int | None = None
    for _ in range(max_rounds):
        deg = alive.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src").localCheckpoint(
            eager=False
        )
        nxt = (
            alive.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
        )
        n_edges = nxt.count()
        alive = nxt
        if n_edges == 0 or n_edges == prev_edges:
            return alive.groupBy(F.col("src").alias("node")).agg(
                F.count(F.lit(1)).alias("degree")
            )
        prev_edges = n_edges
    raise RuntimeError(f"k-core peel did not converge within {max_rounds} rounds")
