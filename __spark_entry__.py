"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``minimised_impala_spark/queries`` and
``minimised_impala_spark/extensions`` and self-register into the
registry; this module is just the adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import ORACLES, QUERIES

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


# The driver verifies only the first 50 registry entries per round.
# Cumulatively r1∪r2∪r3∪r4∪r5 drove 226 distinct queries, all green at
# their latest check; exactly 17 registered names have never had a
# driver row (the r5 50-cap ended before reaching them). Round 6 leads
# with those 17 (including the 3 the old list omitted entirely:
# source_schema_evolution, text_gopher_rules, text_contamination_matrix),
# then the round-6 additions, then the queries whose SEMANTICS changed
# in the r6 advice fixes (pre-rank 6dp rounding) so their green rows
# refresh, then regression rotation onto the OLDEST green rows — names
# whose last driver row is r1 (TPC-H/TPC-DS bulk, join modes, agg
# basics). Names past the cap keep their earlier green rows; the rest
# of the r1/r2-era names queue behind for the r7 rotation.
_PRIORITY = [
    # --- never driver-verified (17) — close the coverage gap first ---
    "agg_filter_clause", "agg_listagg_keyed", "window_count_distinct",
    "source_schema_evolution", "nested_map_funcs", "dialect_qualify",
    "ddl_bucketed_join", "sim_rrf_hybrid", "sim_mmr_rerank",
    "sim_ann_recall_report", "text_gopher_rules", "text_bpe_merge",
    "text_span_corruption", "text_wordpiece_encode",
    "text_curriculum_shards", "text_contamination_matrix",
    "streaming_window_unique_users",
    # --- new in round 6 ---
    "ddl_compute_stats_roundtrip", "sim_filtered_ann",
    "sim_diverse_sample", "text_domain_cap",
    "events_triangle_count", "text_tfidf_keywords",
    "dedup_minhash_accuracy_report", "text_ngram_novelty",
    "events_seasonal_baseline", "streaming_quantile_sketch",
    "source_xml_scan", "agg_regression_suite",
    "agg_kmv_distinct_report", "window_named_clause",
    "nested_lateral_view", "tpcds_q4_growth_ratio",
    "tpcds_q23_frequent_best", "text_langid_confusion",
    "text_char_entropy", "text_html_strip", "dedup_url",
    # --- semantics touched by the r6 advice fixes (pre-rank rounding,
    # scale-safe curriculum epsilon already above) — refresh green rows
    "sim_lsh_ann", "sim_matryoshka_topk", "sim_binary_quant_topk",
    "sim_cosine_topk", "sim_lsh_multiprobe", "sim_knn_classify",
    # --- regression rotation: oldest green rows (last driver row r1) ---
    "tpch_q2", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "tpcds_q3_star", "tpcds_q47_monthly_lag", "tpcds_q53_deviation",
    "tpcds_q59_dow_ratio", "tpcds_q61_promo_ratio",
    "tpcds_q65_brand_share", "tpcds_q73_order_counts",
    "tpcds_q88_band_counts", "tpcds_q98_class_share",
    # NOTE: the 50-cap cut-off moves as round-6 additions land above;
    # everything from here keeps earlier green rows and queues for r7.
    "tpcds_q27_rollup_star", "tpcds_q68_order_detail",
    "tpcds_q51_cumulative_compare", "tpcds_q6_price_above_type_avg",
    "tpcds_q8_intersect_gate",
    "join_right_outer", "join_right_semi", "join_left_anti",
    "join_cross", "join_theta", "agg_stats", "agg_group_concat",
    "agg_percentile_exact", "agg_having",
    # r2-era greens queue next
    "tpch_q1", "tpch_q3", "join_full_outer", "join_null_aware_anti",
    "join_null_safe_eq", "agg_distinct_multi", "agg_ndv_sketches",
    "source_text_scan", "source_ext_kv_scan", "select_values",
    "agg_rollup", "agg_pivot", "agg_sketch_suite", "window_rank_suite",
    "window_rows_frame", "window_lag_lead", "window_topk_per_group",
    "sort_nulls_limit_offset", "set_union", "set_intersect_except",
    "scalar_string", "scalar_datetime", "scalar_conditional",
    "scalar_cast", "scalar_parity_fns", "scalar_char_varchar",
    "subq_scalar_correlated", "subq_not_in_null_semantics",
    "nested_explode_tokens", "nested_struct_roundtrip",
    "nested_map_access", "dedup_exact", "dedup_minhash_lsh",
    "dedup_cluster_cc", "sim_ivf_ann",
    "text_quality", "multimodal_binary_meta", "multimodal_audio_chunks",
    # remaining greens follow in registration order via _ordered_names
]


def _ordered_names() -> list[str]:
    seen = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(seen)]
    return seen + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    names = _ordered_names()
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    names = _ordered_names()
    return {n: ORACLES[n] for n in names if n in ORACLES}
