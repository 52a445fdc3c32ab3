"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementation lives in ``appstore_aws_etl_spark``; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import appstore_aws_etl_spark.queries  # noqa: F401  (populates REGISTRY)
from appstore_aws_etl_spark.registry import REGISTRY

FLAGSHIP = "agg_group"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Keys the round-1 driver sweep verified (CORRECTNESS_r01.json) — it
# covered exactly the first 50 registry keys in dict order before its
# budget ran out.  queries() therefore yields the keys with *no* hard
# driver evidence yet first (cheapest first, heavy LLM ops at the end
# of that block), and the already-proven round-1 keys last, so a
# budgeted sweep maximizes fresh coverage.
_R1_DRIVER_VERIFIED = frozenset(
    {
        "agg_global", "agg_count_distinct", "agg_approx_distinct",
        "agg_approx_percentile", "agg_filtered", "agg_grouping_sets",
        "agg_rollup", "agg_cube", "agg_stats", "agg_percentile",
        "agg_argmax", "agg_collect", "agg_pivot", "agg_topk_group",
        "ts_gapfill_rollup", "etl_merge_upsert", "etl_scd2_history",
        "etl_snapshot_diff", "agg_histogram", "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume", "tpch_q10_returned_items",
        "sub_scalar_correlated", "sub_in_subquery", "sub_not_in_anti",
        "agg_group", "fn_string_basic", "fn_string_pad", "fn_regex",
        "fn_split", "fn_date_parts", "fn_date_arith", "fn_date_trunc",
        "fn_math", "fn_conditional", "fn_array_explode", "fn_array_hof",
        "fn_map", "fn_bitwise", "fn_map_explode", "fn_variant",
        "fn_json_extract", "fn_json_struct", "join_inner", "join_broadcast",
        "join_left", "join_right", "join_full", "join_semi", "join_anti",
    }
)
# Keys the round-2 driver sweep verified green (CORRECTNESS_r02.json);
# like the round-1 set they sort to the back of queries() so a
# budgeted round-3 sweep spends its time on still-unverified keys.
_R2_DRIVER_VERIFIED = frozenset(
    {
        "agg_boolean_aggs", "agg_corr_regr", "agg_decimal_money",
        "agg_heavy_hitters", "agg_mad_robust", "agg_string_agg",
        "agg_unpivot", "analytics_abc_class", "analytics_market_basket",
        "analytics_mom_growth", "analytics_rfm", "fn_array_setops",
        "fn_date_calendar", "fn_hash_encode", "graph_pagerank",
        "join_bloom_prefilter", "join_cross", "join_multikey",
        "join_null_safe", "join_range", "join_self", "join_theta",
        "llm_cosine", "llm_dedup_exact", "llm_knn", "llm_wordcount",
        "tpch_q13_customer_distribution", "tpch_q14_promo_share",
        "tpch_q15_top_supplier", "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_orders", "tpch_q19_disjunctive",
        "tpch_q22_dormant_customers", "tpch_q4_priority_exists",
        "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
        "tpch_q8_market_share", "util_data_quality", "util_table_profile",
        "util_zorder_layout",
    }
)
_R3_DRIVER_VERIFIED = frozenset(
    {
        "agg_bloom_filter", "agg_countmin_sketch", "agg_hll_rollup",
        "agg_mode", "analytics_cohort_retention", "analytics_dau_wau",
        "analytics_event_transitions", "analytics_streaks", "filter_between",
        "filter_boolean", "filter_compare", "filter_in", "filter_like",
        "graph_connected_components", "graph_triangle_count", "join_asof",
        "join_asof_nearest", "join_interval_overlap", "join_salted_skew",
        "llm_char_entropy", "llm_clean_corpus", "llm_containment_pairs",
        "llm_corpus_stats", "llm_doc_chunk", "llm_fingerprint",
        "llm_hash_sample", "llm_keywords", "llm_knn_rerank", "llm_lang_id",
        "llm_mix_weighted", "llm_multimodal_meta", "llm_ngrams",
        "llm_pii_redact", "llm_quality_filter", "llm_repetition_score",
        "llm_segment_dedup", "llm_split_assign", "llm_stratified_sample",
        "llm_tfidf", "llm_token_count", "llm_unigram_logprob",
        "llm_vector_centroid", "llm_vector_quantize", "project_alias",
        "project_cast", "project_computed", "project_select",
        "ts_anomaly_zscore", "ts_ewma", "util_compaction_plan",
    }
)
_DRIVER_VERIFIED = _R1_DRIVER_VERIFIED | _R2_DRIVER_VERIFIED | _R3_DRIVER_VERIFIED
# Heavy keys (multi-second at sf0.01: LSH signature UDFs, IVF training,
# gram self-joins, iterative label propagation) that have NEVER had a
# driver row recorded — interleaved among the cheap unswept keys so the
# ~50-key sweep budget gives each of them first evidence this round
# instead of stranding all of them behind the cheap block again.
_PRIORITY_HEAVY = (
    "llm_dedup_minhash", "llm_dedup_simhash", "llm_dedup_embedding",
    "llm_dedup_survivors", "llm_knn_ivf", "llm_multimodal_features",
    "llm_pack_sequences", "llm_topic_cluster", "sub_recursive_hierarchy",
)
# Remaining unswept keys ride after the first ~50: the non-§2-core
# extras (ORC scan, window extensions) and the heavies that at least
# have local hash-match evidence already.
_DEFERRED = (
    "scan_orc", "win_nth_value", "win_scalable_cumsum", "win_moving_median",
    "win_time_range_frame", "llm_jaccard_ngram", "llm_sim_join",
    "llm_edit_distance_verify", "llm_contamination", "llm_dedup_clusters",
    "llm_multimodal_frames",
)
# Keys whose round-3 driver evidence was rows-only but which gained an
# exact oracle in round 4 — queued right after the unswept block so a
# generous sweep budget upgrades them to hash-level evidence.
_ORACLE_UPGRADED = ("ts_ewma", "llm_knn_rerank")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    a budgeted correctness sweep (~50 keys/round, dict order) hits
    driver-unverified keys first: §2-core cheap keys with one
    never-executed heavy key interleaved after every 5th cheap key,
    then the deferred extras, then the already-driver-proven keys."""
    skip = _DRIVER_VERIFIED | set(_PRIORITY_HEAVY) | set(_DEFERRED)
    cheap = [n for n in REGISTRY if n not in skip]
    heavy = [n for n in _PRIORITY_HEAVY if n in REGISTRY and n not in _DRIVER_VERIFIED]
    interleaved: list[str] = []
    hi = 0
    for i, name in enumerate(cheap):
        interleaved.append(name)
        if (i + 1) % 5 == 0 and hi < len(heavy):
            interleaved.append(heavy[hi])
            hi += 1
    interleaved.extend(heavy[hi:])
    deferred = [n for n in _DEFERRED if n in REGISTRY and n not in _DRIVER_VERIFIED]
    upgraded = [n for n in _ORACLE_UPGRADED if n in REGISTRY]
    proven = [
        n for n in REGISTRY if n in _DRIVER_VERIFIED and n not in _ORACLE_UPGRADED
    ]
    return {
        name: REGISTRY[name].fn
        for name in interleaved + deferred + upgraded + proven
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-bearing query key."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
