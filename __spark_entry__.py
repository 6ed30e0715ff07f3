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
# representative list — union 93/136.  Round 3 spends the cap on the tail:
# first the 9 rows that were red in CORRECTNESS_r02 (4 oracle-typing hash
# mismatches now pinned, 5 events/streaming errors killed by the fixed
# tables.py events-ts loader), then the 43 never-driver-verified names
# (r1 ∪ r2 complement), with the 3 rows-only (no-oracle) queries last among
# them since their driver check is weaker anyway.  r1 ∪ r2 ∪ r3 then covers
# all 133 oracled queries.  Previously-green representatives follow, then
# registration order.
_PRIORITY = [
    # red in r2 — re-verify first (oracle typing pinned / loader fixed)
    "window_range_numeric", "scalar_math", "scalar_decimal",
    "pipeline_corpus_curation",
    "events_sessionize", "events_asof_join", "events_range_join",
    "streaming_window_counts", "streaming_dedup_exact",
    # never driver-verified: new-in-r3 scans, then aggregates/sets
    "source_avro_scan", "source_sequencefile_scan",
    "agg_minmax_types", "set_union_distinct", "agg_cube_grouping",
    "agg_sample_reservoir", "agg_corr_covar", "agg_bitwise",
    # windows
    "window_range_frame", "window_first_last", "window_percentile",
    # subqueries
    "subq_scalar_uncorrelated", "subq_exists_correlated",
    "subq_not_exists_correlated", "subq_in_aggregated", "subq_in_disjunction",
    # nested types
    "nested_array_funcs", "nested_explode_outer", "nested_tpch_q18",
    "nested_tpch_pricing", "nested_exists_predicate",
    "nested_tpch_double_unnest",
    # events suite tail
    "events_window_agg", "events_json_extract", "events_funnel",
    "events_funnel_ordered", "events_retention", "events_gapfill",
    "events_zscore_anomaly", "events_path_mining",
    # dedup tail
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_embedding",
    "dedup_keep_best",
    # similarity tail
    "sim_lsh_buckets", "sim_quantized_topk", "sim_lsh_multiprobe",
    # text pipeline tail
    "text_langid", "text_tokens", "text_fingerprint",
    "text_sample_deterministic", "text_repetition", "text_mix_sources",
    "text_contamination", "text_boilerplate_ngrams", "pipeline_pii_redaction",
    # streaming tail
    "streaming_sliding_counts", "streaming_session_window",
    "streaming_attribution_join", "streaming_enrich_join",
    # rows-only (no oracle — weaker driver check, so last within the cap;
    # two of the three spill to round 4)
    "streaming_sessionize_stateful", "multimodal_decode_stub",
    "multimodal_frame_sample",
    # previously-green category representatives (r1/r2), for regression
    # coverage if the driver's cap ever rises
    "tpch_q1", "source_text_scan", "source_ext_kv_scan", "select_values",
    "tpch_q3", "join_full_outer", "join_null_aware_anti", "join_null_safe_eq",
    "agg_distinct_multi", "agg_ndv_sketches", "agg_rollup", "agg_pivot",
    "agg_sketch_suite", "window_rank_suite", "window_rows_frame",
    "window_lag_lead", "window_topk_per_group", "sort_nulls_limit_offset",
    "set_union", "set_intersect_except", "scalar_string", "scalar_datetime",
    "scalar_conditional", "scalar_cast", "scalar_parity_fns",
    "scalar_char_varchar", "subq_scalar_correlated",
    "subq_not_in_null_semantics", "nested_explode_tokens",
    "nested_struct_roundtrip", "nested_map_access", "dedup_exact",
    "dedup_minhash_lsh", "dedup_cluster_cc", "sim_cosine_topk", "sim_lsh_ann",
    "sim_ivf_ann", "text_quality", "text_pack_sequences",
    "multimodal_binary_meta", "multimodal_audio_chunks",
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
