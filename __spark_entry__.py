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
# Round-11 queue, per the protocol (changed-code rows first, then
# rotation onto the oldest green rows):
#   1-3   changed in r11: events_triangle_count, events_link_prediction,
#         events_degree_distribution (the data-proportional
#         F.broadcast(deg) hints removed — VERDICT r10 "What's wrong"
#         #1; strategy now AQE's choice, results invariance-pinned, and
#         changed code earns fresh rows);
#   4-48  the COMPLETE r4-era rotation block (45 names whose latest
#         driver rows date to r4 — VERDICT r10 directive #4: drain it
#         entirely so nothing older than r5 remains). Order is the
#         r10 queue-tail age order. Includes all seven r4 streaming
#         rows, which also re-earn rows after the r11 stage-dir
#         symlink-repair fix (ADVICE r10 medium);
#   49    events_cohort_ltv — the r11 sf1 sweep's one defect (FP
#         window-sum noise flipped a .5-landing round at sf1; revenue
#         now accumulates as DECIMAL(38,0) cents on both sides, and the
#         data-proportional per-user cohorts broadcast hint is gone):
#         changed code + sweep fix earns the fresh row;
#   50    tpch_q1 — the r11 sf10 (100×) margin smoke found dsum's
#         round-after-FP-sum margin exhausted for q1's revenue-
#         magnitude sums (base_price off one cent, disc_price ~5e-3,
#         avg_price 10th digit); sum_base_price/sum_disc_price are now
#         isum and avg_price iavg on both sides, strict-verified at
#         ALL FIVE scales (sf0.001/0.01/0.1/sf1/sf10). An arithmetic
#         change outranks events_ab_test_report's plan-hint-only change
#         for the last slot: ab_test (now 51) is proven bit-identical
#         by the invariance sweep and four-scale strict-verified in
#         NOTES, so its driver row can wait a round.
_PRIORITY = [
    # --- changed in round 11: deg/users-broadcast hint removal + the
    # sf1 sweep's cohort fix ---
    "events_triangle_count", "events_link_prediction",
    "events_degree_distribution", "events_cohort_ltv",
    # --- the full r4-era rotation block, oldest-first ---
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
    # --- final slot: the q1 isum extension (sf10-margin fix) ---
    "tpch_q1",
    # --- past the 50-cap: the remaining r11 changed rows (ab_test:
    # hint-only, invariance-proven; simhash: plan-BUILD string-expr
    # refactor, strict-verified at sf0.001/0.01/sf1 in NOTES), then the
    # r5-era block oldest-first ---
    "events_ab_test_report", "dedup_simhash",
    "dedup_embedding_lsh", "udf_java_jar",
    "agg_boolean_suite", "agg_salted_skew", "agg_unpivot",
    "ddl_alter_truncate", "ddl_insert_partitions", "ddl_load_data",
    "ddl_sql_function", "ddl_view_cte", "dedup_containment",
    "dedup_paragraph", "dedup_semdedup", "dedup_span_ngram",
    "dialect_broadcast_hint", "events_mad_anomaly",
    "events_pagerank_transitions", "events_pattern_match",
    "events_scd2_intervals", "events_session_window_native",
    "events_time_decay", "join_lateral", "join_salted_skew",
    "multimodal_pair_clip_filter", "pipeline_corpus_diff",
    "pipeline_data_quality", "pipeline_dataset_card",
    "pipeline_incremental_stats", "scalar_decimal",
    "sim_centroid_classify", "sim_ivfpq_ann", "sim_kmeans_cluster",
    "sql_recursive_reachability", "streaming_dedup_lsh",
    "streaming_drift_kl", "streaming_upsert_sink", "text_bigram_lm",
    "text_bm25_topk", "text_dsir_importance", "text_pack_sequences",
    "text_quality_classifier", "text_token_budget_mix",
    "text_weighted_sample", "udtf_longest_streak",
    "udtf_sentence_split",
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
