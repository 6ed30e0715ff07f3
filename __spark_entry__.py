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


# The driver verifies only the first 50 registry entries per round. Round 1
# covered the registration-order prefix; round 2 a category-spanning
# representative list; round 3 the never-verified tail — r1 ∪ r2 ∪ r3
# drove 134 distinct queries, leaving exactly 12 names never
# driver-verified (the r3 cap ended mid-list).  Round 4 puts those 12
# first so every registered query has at least one driver row across
# r1–r4, then the 5 rows that were red in r3 (all re-worked this round:
# scaled-BIGINT stats, dsum shims, CSV-joined arrays — see each query's
# docstring), then the round-4 additions. The 50-cap lands exactly at the
# end of the first 33 additions (dedup_edit_distance is slot 50); the
# later additions queue at 51+ and lead round 5, followed by
# previously-green category representatives for regression rotation.
_PRIORITY = [
    # never driver-verified through r3 — close the coverage gap first
    "text_repetition", "text_mix_sources", "text_contamination",
    "text_boilerplate_ngrams", "pipeline_pii_redaction",
    "streaming_sliding_counts", "streaming_session_window",
    "streaming_attribution_join", "streaming_enrich_join",
    "streaming_sessionize_stateful", "multimodal_decode_stub",
    "multimodal_frame_sample",
    # red in r3 — re-worked, re-verify
    "agg_sample_reservoir", "nested_array_funcs", "window_percentile",
    "agg_corr_covar", "scalar_decimal",
    # new in round 4
    "join_right_anti", "agg_histogram", "dedup_embedding",
    "text_split_assignment", "text_global_shuffle", "text_sample_stratified",
    "pipeline_near_dedup", "udf_pandas_scalar", "uda_grouped_pandas",
    "ddl_ctas_roundtrip", "source_json_scan", "source_orc_scan",
    "streaming_foreach_batch_sink", "pipeline_decontaminate_bloom",
    "streaming_dedup_watermarked", "streaming_outer_join",
    "text_heavy_hitters", "events_rollup_hierarchy", "sim_knn_classify",
    "dedup_prefix_filter", "dedup_incremental",
    "multimodal_resize_stub", "multimodal_features", "text_lm_score",
    "text_chunk_overlap", "text_temperature_resample",
    "window_ignore_nulls", "text_countmin_hitters",
    "pipeline_merge_upsert", "sim_pq_ann", "agg_kll_quantiles",
    "streaming_topk_windowed", "dedup_edit_distance",
    # slot 51+ — first names past this round's 50-cap; r5 leads with these
    "sim_ivfpq_ann", "dedup_containment", "pipeline_data_quality",
    "events_scd2_intervals", "multimodal_pair_clip_filter",
    "streaming_upsert_sink", "events_concurrency_curve",
    "text_token_budget_mix", "join_lateral", "agg_boolean_suite",
    "pipeline_dataset_card", "events_session_window_native",
    "pipeline_incremental_stats", "udtf_sentence_split",
    "udtf_longest_streak",
    # text_pack_sequences re-led: its prefix-sum operator was bug-fixed this round
    "text_pack_sequences",
    # previously-green category representatives (regression coverage)
    "tpch_q1", "tpch_q5", "tpch_q18", "source_text_scan", "source_avro_scan",
    "source_sequencefile_scan", "source_ext_kv_scan", "select_values",
    "join_full_outer", "join_null_aware_anti", "join_null_safe_eq",
    "agg_distinct_multi", "agg_ndv_sketches", "agg_rollup", "agg_pivot",
    "agg_bitwise", "window_rank_suite", "window_rows_frame",
    "window_range_numeric", "window_topk_per_group",
    "sort_nulls_limit_offset", "set_union", "scalar_math", "scalar_string",
    "scalar_datetime", "scalar_cast", "scalar_parity_fns",
    "subq_not_in_null_semantics", "subq_exists_correlated",
    "nested_explode_outer", "nested_tpch_q18", "nested_map_access",
    "events_sessionize", "events_asof_join", "events_gapfill",
    "events_path_mining", "streaming_window_counts", "streaming_dedup_exact",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_cluster_cc",
    "sim_cosine_topk", "sim_lsh_ann", "sim_ivf_ann", "sim_quantized_topk",
    "text_quality", "text_tokens",
    "pipeline_corpus_curation", "multimodal_binary_meta",
    "multimodal_audio_chunks",
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
