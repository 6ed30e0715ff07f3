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
# Round-10 queue, per the protocol (changed-code rows first, then
# rotation onto the oldest green rows, then this round's new
# registrations, then deeper rotation):
#   1-3   changed in r10: tpch_q1 (isum accumulator BIGINT →
#         DECIMAL(38,0), ADVICE r9 #1 — same values at fixture scales,
#         changed code earns a fresh row), events_triangle_count and
#         dedup_threshold_sweep (localCheckpoint → persist at the reuse
#         seams, VERDICT r9 #4 — plan unchanged below the seam, fresh
#         rows anyway);
#   4-33  the COMPLETE r3-era rotation block (30 names whose latest
#         driver rows date to r3 — VERDICT r9 #1: drain it entirely so
#         nothing older than r4 remains);
#   34-45 the 12 TPC-DS parity ports promoted from
#         tests/test_tpcds_parity.py to registry rows (VERDICT r9 #2 —
#         already oracle-compared + zero-row-guarded in pytest since
#         r9; queued behind the rotation block per the directive);
#   46-50 rotation onto the 5 oldest r4-era rows (the r4 block, 48
#         names, becomes the next rotation horizon).
_PRIORITY = [
    # --- changed in round 10 ---
    "tpch_q1", "events_triangle_count", "dedup_threshold_sweep",
    # --- the full r3-era rotation block, oldest-first ---
    "source_sequencefile_scan", "agg_minmax_types",
    "set_union_distinct", "agg_cube_grouping", "agg_bitwise",
    "window_range_frame", "window_first_last",
    "subq_exists_correlated", "subq_in_disjunction", "nested_explode_outer",
    "nested_tpch_q18", "nested_tpch_pricing", "nested_exists_predicate",
    "nested_tpch_double_unnest", "events_window_agg",
    "events_json_extract", "events_funnel", "events_funnel_ordered",
    "events_retention", "events_gapfill", "events_zscore_anomaly",
    "events_path_mining", "dedup_ngram_jaccard", "dedup_keep_best",
    "sim_lsh_buckets", "sim_quantized_topk", "text_langid",
    "text_tokens", "text_fingerprint", "text_sample_deterministic",
    # --- new in round 10: TPC-DS registry promotions ---
    "tpcds_q7", "tpcds_q19", "tpcds_q34", "tpcds_q42", "tpcds_q43",
    "tpcds_q46", "tpcds_q52", "tpcds_q55", "tpcds_q63", "tpcds_q79",
    "tpcds_q89", "tpcds_q96",
    # --- final five slots: rows whose CODE changed in the late-r10 sf1
    # oracle sweep fixes (agg_winsorize cents accumulation;
    # nested_tpch_q21 GROUP BY s_name; the two streaming rows touched by
    # the stream-stage part-file fix — both also r4-era rotation debt)
    # plus the single oldest r4 row ---
    "agg_winsorize", "nested_tpch_q21", "agg_sample_reservoir",
    "streaming_sliding_counts", "streaming_session_window",
    # --- past the 50-cap: rest of the r4-era block in age order, so a
    # deeper sweep (or the r11 rebuild) starts from the oldest ---
    "agg_corr_covar", "window_percentile",
    "nested_array_funcs", "dedup_embedding",
    "text_repetition", "text_mix_sources", "text_contamination",
    "text_boilerplate_ngrams", "pipeline_pii_redaction",
    "streaming_attribution_join", "streaming_enrich_join",
    "streaming_sessionize_stateful", "multimodal_decode_stub",
    "multimodal_frame_sample", "join_right_anti", "agg_histogram",
    "text_split_assignment", "text_global_shuffle",
    "text_sample_stratified", "pipeline_near_dedup",
    "udf_pandas_scalar", "uda_grouped_pandas", "ddl_ctas_roundtrip",
    "source_json_scan", "source_orc_scan",
    "streaming_foreach_batch_sink", "pipeline_decontaminate_bloom",
    "streaming_dedup_watermarked", "streaming_outer_join",
    "text_heavy_hitters", "events_rollup_hierarchy",
    "dedup_prefix_filter", "dedup_incremental",
    "multimodal_resize_stub", "multimodal_features", "text_lm_score",
    "text_chunk_overlap", "text_temperature_resample",
    "window_ignore_nulls", "text_countmin_hitters",
    "pipeline_merge_upsert", "sim_pq_ann", "agg_kll_quantiles",
    "streaming_topk_windowed", "dedup_edit_distance",
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
