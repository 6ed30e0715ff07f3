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
# Cumulatively r1∪…∪r6 drove 264 distinct queries, all green at their
# latest check; exactly ONE registered name has never had a driver row
# (events_link_prediction — registered in the r6 end-of-round snapshot
# after the driver run). Round 7 leads with that orphan, then the 26
# round-7 additions, then regression rotation onto the OLDEST green
# rows. The cap cuts 23 names into the r1 block (tpch_q9–q22 and 9
# TPC-DS rows rotate; the remaining 15 r1-green names — 5 TPC-DS, the
# 6 join modes and 4 agg basics — are the r8 rotation debt, listed
# next in order). Names past the cap keep their earlier green rows.
_PRIORITY = [
    # --- never driver-verified (1) — close the coverage gap first ---
    "events_link_prediction",
    # --- new in round 7 (names appended here as each query registers;
    # registering in the round-snapshot commit is banned — see r6) ---
    "agg_kll_accuracy_report", "events_markov_next_event",
    "events_burst_detection", "sim_range_search",
    "agg_theta_sketch_ops", "text_stopword_profile",
    "text_word_cooccurrence", "dedup_threshold_sweep",
    "dedup_cross_source", "events_rfm_segmentation",
    "text_zipf_fit", "pipeline_schema_drift_report",
    "streaming_cm_error_report", "events_cohort_ltv",
    "events_multitouch_attribution", "agg_hll_union_report",
    "events_interval_coverage", "events_changepoint_cusum",
    "events_survival_km", "agg_weighted_percentile",
    "events_ab_test_report", "events_autocorrelation",
    "events_velocity_flags", "dedup_normalized_exact",
    "text_code_detection", "events_bot_regularity",
    # --- regression rotation: oldest green rows (last driver row r1) ---
    "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13",
    "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    "tpcds_q3_star", "tpcds_q47_monthly_lag", "tpcds_q53_deviation",
    "tpcds_q59_dow_ratio", "tpcds_q61_promo_ratio",
    "tpcds_q65_brand_share", "tpcds_q73_order_counts",
    "tpcds_q88_band_counts", "tpcds_q98_class_share",
    "tpcds_q27_rollup_star", "tpcds_q68_order_detail",
    "tpcds_q51_cumulative_compare", "tpcds_q6_price_above_type_avg",
    "tpcds_q8_intersect_gate",
    "join_right_outer", "join_right_semi", "join_left_anti",
    "join_cross", "join_theta", "agg_stats", "agg_group_concat",
    "agg_percentile_exact", "agg_having",
    # --- r2-era greens fill the rest of the 50-cap; overflow queues r8 ---
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
