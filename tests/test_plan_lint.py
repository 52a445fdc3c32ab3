"""Plan lint over the ENTIRE query inventory: global scale-discipline
rules every registered plan must obey (SURVEY.md §7.4.7), checked
against the physical plan at sf0.001.

Rules:
  1. No CartesianProduct/BroadcastNestedLoopJoin except where the
     operator is inherently non-equi (cross, theta) or scores against
     broadcast model parameters (similarity ops).
  2. No row-at-a-time PythonUDF in any plan except the one operator
     whose contract is exactly that (udf_scalar). Arrow paths
     (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are fine.
  3. Every parquet scan carries a pruned ReadSchema (never SELECT * of
     a wider table than declared) — spot-checked via scan width cap.
"""

from __future__ import annotations

import pytest

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.plans import formatted_plan
from appstore_aws_etl_spark.registry import REGISTRY

# inherently non-equi / parameter-broadcast operators
NESTED_LOOP_OK = {
    "join_cross",
    "join_theta",
    "llm_knn",        # scoring against one broadcast query vector
    "llm_knn_ivf",
    "llm_tfidf",      # crossJoin(broadcast(n_docs)) — 1-row corpus stat
    "llm_keywords",   # same tfidf() core — 1-row corpus stat
    "tpch_q22_dormant_customers",  # crossJoin(broadcast(avg_bal)) — 1-row scalar
    "analytics_market_basket",     # crossJoin(broadcast(n_orders)) — 1-row scalar
    "util_data_quality",           # crossJoin(broadcast(n_rows)) — 1-row scalar
    "agg_countmin_sketch",         # crossJoin(broadcast(seeds)) — 4-row hash params
    "agg_bloom_filter",            # crossJoin(broadcast(seeds)) — 3-row hash params
    "llm_unigram_logprob",         # crossJoin(broadcast(total)) — 1-row corpus stat
    "tpch_q11_important_stock",    # crossJoin(broadcast(thresh)) — 1-row scalar
    "graph_triangle_count",        # crossJoin(broadcast(edge/node counts)) — 1-row scalars
    "llm_bm25_score",              # crossJoin(broadcast(N, avgdl)) — 1-row corpus stat
    "llm_bpe_apply_merge",         # crossJoin(broadcast(top1 pair)) — 1-row winner
}
ROW_UDF_OK = {"udf_scalar"}
# construction triggers Spark jobs (model fitting / parameter fetch);
# plans are still linted but these run slower
SLOW_CONSTRUCT = {
    "llm_knn",
    "llm_knn_ivf",
    "llm_bpe_train",
    "llm_knn_ivfpq_delete",
    # r13 deployed dedup index: construction may build/refresh the
    # cached index relations (one-time per fixture)
    "llm_dedup_index_probe",
    "llm_dedup_index_refresh",
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    # start from an empty CacheManager so the session-hygiene test
    # below observes only what REGISTRY construction itself pins
    # (other test modules legitimately cache frames in the shared
    # session fixture)
    spark.catalog.clearCache()
    out = {}
    for name, spec in REGISTRY.items():
        out[name] = formatted_plan(spec.fn(spark, sf_dir))
    return out


def test_no_unexpected_nested_loop_joins(plans):
    offenders = [
        name
        for name, plan in plans.items()
        if name not in NESTED_LOOP_OK
        and ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
    ]
    assert offenders == []


def test_no_wide_array_literal_case_chains(plans):
    """Round-10 rule (the lint analogue of the `# bounded:` broadcast
    rule): a CASE chain whose branches yield ARRAY LITERALS embeds
    O(branches x dim) constants in the expression tree — plan
    analysis/codegen cost then grows with a model parameter instead of
    staying O(1). Round 9's IVFADC residual path shipped exactly this
    (an n_cells-way centroid-array CASE; at corpus-realistic
    n_cells ~ sqrt(n) ~ 450 the plan alone is ~2 MB of literals) and
    was re-shaped to a broadcast join on centroid_id. Bounded chains
    are legitimate — the nprobe-way ADC lookup-table CASE is
    parameter-bounded by construction — so the cap is 32 branches:
    anything wider belongs in a broadcast-joined parameter relation."""
    import re

    pat = re.compile(r"WHEN .{0,120}? THEN \[")
    offenders = {
        name: len(pat.findall(plan))
        for name, plan in plans.items()
        if len(pat.findall(plan)) > 32
    }
    assert offenders == {}, (
        f"array-literal CASE chains wider than 32 branches: {offenders} "
        "— ship the arrays as a broadcast-joined relation instead"
    )


def test_no_unexpected_row_python_udfs(plans):
    offenders = [
        name
        for name, plan in plans.items()
        if name not in ROW_UDF_OK and "BatchEvalPython" in plan
    ]
    assert offenders == []


def test_all_parquet_scans_vectorized(plans):
    # every parquet scan must use the vectorized columnar reader
    # (Batched: true); a row-based scan means a type fell off the
    # vectorized path (codegen markers are hidden under AdaptiveSparkPlan
    # pre-execution, so the scan batch flag is the assertable signal)
    for name, plan in plans.items():
        for chunk in plan.split("\n\n"):
            if "Scan parquet" in chunk and "Location: InMemoryFileIndex" in chunk:
                assert "Batched: true" in chunk, f"{name} has a row-based scan:\n{chunk}"


def test_no_pinned_cache_entries_session_wide(spark, plans):
    """Session hygiene: constructing every registered query (which runs
    the eager parts — label-propagation loops, k-means fits, parameter
    collects) must leave ZERO entries pinned in the CacheManager. A
    df.persist()/cache() without a paired unpersist survives for the
    life of the session and accumulates executor storage across a
    201-query sweep; shared intermediates therefore use lazy
    localCheckpoint, whose blocks the ContextCleaner frees on GC."""
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "a registry query pinned a DataFrame in the CacheManager "
        "(df.cache()/persist() without unpersist)"
    )


def test_broadcast_sites_carry_bounded_justification():
    """Round-9 rule closing the last forced-broadcast OOM class: an
    explicit F.broadcast() is only legal on inputs whose cardinality is
    provably bounded independent of scale factor (nation/region, date
    spines, 1-row scalar aggregates, k-parameter tables, sketch words).
    SF-scaling tables (part/customer/supplier/orders/lineitem slices,
    partkey-grain frequency tables, dedup loser lists) must NOT be
    hinted — AQE broadcasts them while observed-small and falls back to
    a shuffled join at scale (the same observed-size criterion that
    replaced static shuffle_hash hints in round 8).

    Mechanically: every `F.broadcast(` call site in package source must
    carry a `# bounded: <reason>` annotation on the same line or within
    the three preceding lines, stating WHY the input cannot grow with
    SF. A new broadcast site without a written bound fails here.
    """
    import pathlib

    pkg = pathlib.Path(appstore_aws_etl_spark.queries.__file__).parents[1]
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if "F.broadcast(" not in line or line.lstrip().startswith("#"):
                continue
            window = lines[max(0, i - 3) : i + 1]
            if not any("bounded:" in w for w in window):
                offenders.append(f"{py.relative_to(pkg.parent)}:{i + 1}")
    assert offenders == [], (
        "F.broadcast() without a '# bounded:' justification (forced "
        f"broadcasts must be provably SF-independent): {offenders}"
    )


def test_session_scale_safety_confs():
    """Pin the round-8 scale-safety session defaults so they cannot
    silently regress:

    * implicit broadcast threshold at Spark's 10 MB default — the 100x
      tier showed a 64 MB threshold lets parquet-COMPRESSED size
      estimates implicitly broadcast multi-million-row fact
      projections (5.1 s vs 1.1 s at 10x; a driver OOM at scale);
    * AQE's observed-size SMJ->SHJ conversion DISABLED (the real conf,
      spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold, at its
      0 default). Round 9 discovered the r8 conf name was not a Spark
      conf (silent no-op) and that actually enabling the machinery at
      64 MB reproduces the hash-map-build OOM on join_multikey at the
      100x tier — the threshold reads compressed shuffle bytes while
      the build is deserialized, and no threshold separates the
      measured q12 win from the OOM (BASELINE.md). Sort-merge's
      graceful spill is the scale-safe default; this pin fails if
      anyone re-enables the conversion without a new adjudication.
    """
    from appstore_aws_etl_spark.session import get_spark

    s = get_spark("conf_pin_test")
    assert s.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(10 * 1024 * 1024)
    assert s.conf.get(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
    ) == "0b"
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
