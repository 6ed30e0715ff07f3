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
# After r7, all 291 then-registered names were green at their latest
# driver check, but 14 rows dated from r1 and 38 from r2. Round 8
# leads with its 5 new queries (registered pre-snapshot, per the r6
# rule), then drains the full 14-name r1 rotation debt, then fills the
# remaining 31 slots from the 38-name r2 block. The 7 r2 names cut by
# the cap (tpch_q1, tpch_q3, window_rank_suite, window_rows_frame,
# window_lag_lead, dedup_minhash_lsh, sim_ivf_ann) all have strong
# indirect r7 signal — bench headliners or operators re-exercised by
# the r7 TPC-H/TPC-DS rotation. Names past the cap keep their earlier
# green rows.
#
# Twenty-one more operators landed AFTER the r8 first-50 was frozen
# (queue positions 50-70 below), plus two existing ops whose code
# changed (simhash re-spec, concurrency key widening). All are
# sweep-green at sf0.01 (most also at sf0.1 and sf0.001) but the new
# ones were never driver-verified, so per the protocol they lead the
# r9 first-50, ahead of the 7 deferred r2 names.
_PRIORITY = [
    # --- new in round 8 ---
    "pipeline_quality_scorecard", "pipeline_partition_skew_report",
    "pipeline_compaction_plan", "events_rolling_active",
    "text_readability_scores",
    # --- r1 rotation debt (the last 14 rows older than r2) ---
    "tpcds_q27_rollup_star", "tpcds_q68_order_detail",
    "tpcds_q51_cumulative_compare", "tpcds_q6_price_above_type_avg",
    "tpcds_q8_intersect_gate",
    "join_right_outer", "join_right_semi", "join_left_anti",
    "join_cross", "join_theta", "agg_stats", "agg_group_concat",
    "agg_percentile_exact", "agg_having",
    # --- r2-era rotation (31 of 38; the other 7 head the r9 queue) ---
    "agg_distinct_multi", "agg_ndv_sketches", "agg_pivot", "agg_rollup",
    "agg_sketch_suite", "dedup_cluster_cc", "dedup_exact",
    "join_full_outer", "join_null_aware_anti", "join_null_safe_eq",
    "multimodal_audio_chunks", "multimodal_binary_meta",
    "nested_explode_tokens", "nested_map_access",
    "nested_struct_roundtrip", "scalar_cast", "scalar_char_varchar",
    "scalar_conditional", "scalar_datetime", "scalar_parity_fns",
    "scalar_string", "select_values", "set_intersect_except",
    "set_union", "sort_nulls_limit_offset", "source_ext_kv_scan",
    "source_text_scan", "subq_not_in_null_semantics",
    "subq_scalar_correlated", "text_quality", "window_topk_per_group",
    # --- r9 queue starts here: late-r8 registrations (never driver-
    # verified — slot-1 priority next round per the protocol), then the
    # 7 deferred r2 names ---
    "text_padding_efficiency", "text_quality_calibration",
    "text_kneser_ney_lm", "pipeline_source_overlap_matrix",
    "pipeline_embedding_drift", "text_vocab_coverage_curve",
    "text_heaps_fit", "pipeline_dedup_impact_report",
    "events_lifecycle_states", "events_engagement_histogram",
    "pipeline_shard_assignment", "events_attribution_time_decay",
    "text_entropy_rate", "pipeline_benford_audit",
    "pipeline_k_anonymity_audit", "dedup_cluster_size_histogram",
    "text_jsd_source_divergence", "events_degree_distribution",
    "multimodal_phash_neardup", "pipeline_market_basket",
    "events_hourly_seasonality",
    # semantics changed late in r8 (32-bit/8-bit-band simhash upgraded
    # to the published 64-bit/16-bit-band config) — its old green row
    # no longer describes the current spec, so it queues with the
    # never-verified block per the protocol
    "dedup_simhash",
    # implementation changed late in r8 (concurrency sweep's ordering
    # key widened: lpad truncation at 6 digits merged keys past user
    # id 1e6) — results identical at fixture ids, but the changed code
    # earns a fresh driver row
    "events_concurrency_curve",
    "tpch_q1", "tpch_q3", "window_rank_suite", "window_rows_frame",
    "window_lag_lead", "dedup_minhash_lsh", "sim_ivf_ann",
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
