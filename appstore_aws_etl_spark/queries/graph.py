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

from ..catalog import fanout_width, load
from ..registry import query
from ..ckpt import CHECKPOINT_LEVEL

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
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    # no per-side distinct before the self-join: (orderkey, partkey) is
    # already ~unique in lineitem (599,935 of ~600k rows at sf0.1), so
    # the pre-dedup was a full shuffle that removed almost nothing —
    # the single pair-level distinct below collapses any multiplicity
    # the raw join introduces, leaving the edge set identical to the
    # oracle's DISTINCT-projected formulation.
    # fanout width (optimization r13): the pair self-join and every
    # operator chained on its output (distinct, mirror, degree window)
    # fan OUT relative to lineitem, so they carry their own width
    # derived from the input's bytes (catalog.fanout_width) instead of
    # the session's typical-key shuffle width. repartition on the join
    # key ahead of the join: both aliases reuse the ONE exchange, so
    # the PAIR CHAIN's exchange count is unchanged — only its width
    # scales with data. (The full plan does gain two small-side
    # exchanges per iteration re-aligning the node-sized rank table to
    # width w — r14 doc correction; the pair chain dominates and the
    # driver confirmed 2.83x.) Interleaved A/B at sf0.1, shuffle=2
    # session: see OPTIMIZATION_r13.md pagerank entry.
    w = fanout_width(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").repartition(w, "l_orderkey")
    a, b = op.alias("a"), op.alias("b")
    # generate each undirected edge ONCE (src < dst), dedupe the
    # halved pair stream, then mirror map-side: the self-join emits
    # 1.2M rows instead of 2.4M and the distinct shuffles half the
    # data — the mirror union is a zero-shuffle projection (measured
    # 5.4 -> 4.0 s at sf0.1; at 100 TB it halves the dominant
    # pair-generation exchange)
    # r8: static shuffle_hash removed — the build side is the raw
    # (order, part) fact projection (the join_multikey 100x OOM class:
    # SHJ's hash-map build is unbounded in data-per-partition where
    # SMJ spills); the session's AQE conversion threshold restores the
    # hash build from observed sizes when safe, and the unhinted plan
    # measured equal-or-faster at 10x (2.69 s vs 2.88 s hinted)
    canon = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        # carry the fanout width through the pair dedup: this explicit
        # repartition REPLACES the distinct's own session-width exchange
        # (hashpartitioning(src,dst) satisfies the aggregate's required
        # clustering), so the 2x-mirrored pair stream dedups at w
        .repartition(w, "src", "dst")
        .distinct()
    )
    edges = canon.unionAll(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # same move for the degree window: partitionBy(src) would exchange
    # at session width; pre-partitioning at w replaces, not adds, the
    # exchange — and co-partitions the checkpointed message relation
    # with pr0/the per-iteration rank table (node = src), so the three
    # iteration joins run exchange-free on the message side
    ).repartition(w, "src")
    # out-degree via a window over the SAME src partitioning instead of
    # a separate groupBy + broadcast-join-back: one shuffle + in-
    # partition sort builds the complete message relation in one stage
    # and removes the degree aggregate/broadcast from the DAG entirely
    # (local timing equal; fewer stages, and no reliance on the degree
    # table staying broadcastable as the graph grows). Materialized
    # once with a lazy localCheckpoint (triggered by the n_nodes count
    # below): the unrolled 3-iteration DAG references it three times,
    # blocks are ContextCleaner-released on GC, and the checkpoint
    # keeps the repeated subtree out of each iteration's analyzed plan.
    messages = edges.withColumn(
        "d", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    n_nodes = messages.select("src").distinct().count()  # parameter-only collect
    pr = messages.select(F.col("src").alias("node")).distinct().withColumn(
        "pr", F.lit(1.0) / F.lit(float(n_nodes))
    )
    for _ in range(3):
        # shuffle_hash on the rank side: both join inputs are already
        # partitioned on the join key (messages by src from the window,
        # pr by node from the previous groupBy), so the only SMJ work
        # left was the per-iteration sort of the rank table — SHJ
        # replaces it with an O(n) per-partition hash build (interleaved
        # median-of-5: 0.79 -> 0.67 s for the 3-iteration phase). The
        # build side is n_nodes/partitions rows and SHJ spills if a
        # partition misestimates, so it degrades gracefully at scale.
        rhs = pr.hint("shuffle_hash")
        pr = (
            messages.join(rhs, messages.src == rhs.node)
            .groupBy(F.col("dst"))
            .agg((F.lit(0.15 / n_nodes) + F.lit(_DAMP) * F.sum(F.col("pr") / F.col("d"))).alias("pr"))
            .select(F.col("dst").alias("node"), "pr")
        )
    return pr.select("node", F.round("pr", 9).alias("pr"))


def _weighted_copurchase_edges(spark: SparkSession, sf_dir: str, min_support: int) -> DataFrame:
    """Canonical (src < dst) co-purchase edges kept when the part pair
    co-occurs in >= min_support orders — the support filter that keeps
    a dense co-occurrence graph sparse enough to analyze (and at
    100 TB, keeps the pair-generation shuffle bounded: pairs are
    per-order fanout, then one groupBy on the pair key)."""
    li = load(spark, sf_dir, "lineitem")
    # fanout width (optimization r13): one width-w exchange on the join
    # key serves the (order, part) distinct (hashpartitioning(orderkey)
    # satisfies the aggregate's clustering on a key prefix), BOTH sides
    # of the pair self-join (exchange reuse), and the map-side partial
    # of the pair-count aggregation — the whole exploding chain runs at
    # a width derived from the input's bytes instead of the session's
    # typical-key shuffle width. Exchange count unchanged.
    w = fanout_width(spark, sf_dir, "lineitem")
    op = (
        li.select("l_orderkey", "l_partkey")
        .repartition(w, "l_orderkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    # r8: unhinted for the same reason as graph_pagerank's pair join —
    # raw-fact build side; AQE's observed-size conversion threshold
    # decides the hash build instead of a static hint
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_support)
        .select("src", "dst")
    )


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 3
    ), und AS (
        SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ), nodes AS (
        SELECT DISTINCT src AS node FROM und
    ), reach(a, b) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
    )
    SELECT a AS node, min(b) AS component FROM reach GROUP BY a ORDER BY node
    """,
    tags=("graph", "iterative", "custom-operator"),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the support-3 co-purchase graph via
    min-label propagation, iterated TO CONVERGENCE (a driver-side
    changed-label count per round — parameters only, never data). The
    oracle states the same fixpoint declaratively as a recursive
    reachability CTE, so the comparison pins the exact component
    labeling, not an iteration-budget approximation.

    Scale shape: each round is one shuffle-join (messages) + one
    grouped min (relax) + one label self-join (pointer-doubling
    compress), so rounds needed = O(log diameter), not diameter; the
    shared walk (operators/labelprop.py) localCheckpoints per round so
    the plan tree stays O(1) and RAISES if the cap is hit rather than
    returning an under-propagated labeling."""
    from ..operators.labelprop import propagate_min_labels

    edges = _weighted_copurchase_edges(spark, sf_dir, min_support=3)
    # EAGER: round 1's broadcast futures and main stages otherwise race
    # to first-materialize the lazy checkpoint and duplicate the edge
    # pipeline (see llm_dedup_survivors' matching note)
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    labels = propagate_min_labels(und, labels, "node", "component", max_rounds=50)
    return labels.orderBy("node")


@query(
    "graph_triangle_count",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(DISTINCT node) FROM (
                SELECT src AS node FROM e UNION ALL SELECT dst FROM e)) AS n_nodes
    FROM e ab
    JOIN e bc ON ab.dst = bc.src
    JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
    """,
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the support-2 co-purchase graph. Edges are
    canonicalized src < dst, so each triangle is counted exactly once
    as the ordered wedge a<b<c closed by edge (a,c) — two shuffle
    joins on edge keys, the standard distributed formulation (node-
    iterator with degree-ordered direction). At scale the wedge fanout
    is bounded by orienting edges toward higher degree, which this
    ordering approximates for free on hash-distributed ids."""
    e = _weighted_copurchase_edges(spark, sf_dir, min_support=2).localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
        .join(
            ac,
            (F.col("ac.src") == F.col("ab.src")) & (F.col("ac.dst") == F.col("bc.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .agg(F.count_distinct("node").alias("n_nodes"))
    )
    # bounded: two 1-row scalar aggregates
    return tri.join(F.broadcast(counts)).join(F.broadcast(nodes))


@query(
    "graph_degree_distribution",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), und AS (
        SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
    ), deg AS (
        SELECT src AS node, count(*) AS degree FROM und GROUP BY src
    )
    SELECT degree, count(*) AS n_nodes,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS frac_nodes
    FROM deg GROUP BY degree
    """,
    tags=("graph",),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the support-2 co-purchase graph — the
    first diagnostic run before any iterative graph algorithm (a
    heavy-tailed histogram predicts the skewed-hub shuffle that needs
    salting or AQE skew handling in PageRank/components).

    Scale shape: canonical (src<dst) pair aggregation, degrees as one
    count per node, then the histogram is a second tiny aggregation
    over |distinct degrees| rows; the global normalizing sum is a
    single-column window over that tiny relation, never the node
    set."""
    edges = _weighted_copurchase_edges(spark, sf_dir, min_support=2)
    und = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    from pyspark.sql import Window

    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    total = Window.partitionBy()
    return hist.select(
        "degree",
        "n_nodes",
        F.round(F.col("n_nodes") * 1.0 / F.sum("n_nodes").over(total), 6).alias(
            "frac_nodes"
        ),
    )


@query("graph_kcore", oracle=None, tags=("graph", "iterative", "custom-operator"))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the support-2 co-purchase graph by iterative peeling
    (operators/kcore.py): repeatedly delete nodes with fewer than 3
    surviving co-purchase partners until stable — the dense backbone
    community detectors and influence models start from. Rows-only by
    design: the peeling fixpoint needs a GROUP BY inside the recursion,
    which recursive SQL forbids; correctness is property-tested against
    a sequential peel (tests/test_properties.py) and the convergence
    walk raises rather than returning a half-peeled subgraph."""
    from ..operators.kcore import kcore_nodes

    edges = _weighted_copurchase_edges(spark, sf_dir, min_support=2)
    und = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # und is provably simple: distinct canonical (src<dst) edges
    # unioned with their strict mirror — disjoint halves, no dups
    return kcore_nodes(und, k=3, assume_simple=True).orderBy("node")
