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
# Round-9 queue, per the protocol (never-driver-verified first, then
# this round's new queries, then changed-code rows, then rotation onto
# the oldest green rows):
#   1-23  the r9 block staged at the end of r8 — 21 late-r8 operators
#         (builder-sweep-green at up to three scales, never
#         driver-verified) plus dedup_simhash (64-bit re-spec) and
#         events_concurrency_curve (ordering key widened);
#   24-28 new in r9: tpch_q2 + tpch_q11 (the last two reference TPC-H
#         workload files, runnable via the in-query derived partsupp)
#         and three new SubplanNode compositions (nested_tpch_q20
#         multi-collection correlated aggregate; nested_tpch_order_topn
#         per-row ORDER BY/LIMIT + OUTER unnest; nested_tpch_q21 dual
#         correlated existence over one collection);
#   29    text_ccnet_buckets — rank key moved from packed scalar to the
#         (avg_nll, doc_id) tuple this round (same results at fixture
#         ids; changed code earns a fresh row);
#   30-34 five queries de-vacuoused this round (they were green on
#         empty results — see the block comment below) — changed
#         semantics, fresh rows;
#   35-41 the 7 r2-era rows deferred by the r8 cap;
#   42-50 rotation onto the oldest r3-era rows (9 of 39 not already
#         forced above; the rest are listed after the cap and queue for
#         r10 — rotation horizon is tracked in NOTES.md).
_PRIORITY = [
    # --- r9 block: late-r8 registrations, never driver-verified ---
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
    # changed late in r8: simhash re-specced to 64-bit/16-bit bands;
    # concurrency ordering key widened past the lpad truncation bug
    "dedup_simhash", "events_concurrency_curve",
    # --- new in round 9 ---
    "tpch_q2", "tpch_q11", "nested_tpch_q20", "nested_tpch_order_topn",
    "nested_tpch_q21",
    # --- changed in round 9 (tuple rank key replaces packed scalar) ---
    "text_ccnet_buckets",
    # --- de-vacuoused in round 9: these five were green on EMPTY
    # results at every scale (thresholds outside the fixture's data
    # range — the same class as the replaced q11's 'GERMANY' filter),
    # found by a zero-row sweep over all 320 registered queries. Their
    # predicates now select non-trivial survivor sets at all three
    # scales, so the changed semantics earn fresh driver rows ---
    "subq_scalar_uncorrelated", "subq_not_exists_correlated",
    "subq_in_aggregated", "tpch_q22", "join_left_anti",
    # --- r2-era rows deferred by the r8 cap ---
    "tpch_q1", "tpch_q3", "window_rank_suite", "window_rows_frame",
    "window_lag_lead", "dedup_minhash_lsh", "sim_ivf_ann",
    # --- r3-era rotation (9 slots to the cap; remainder queued) ---
    "window_range_numeric", "scalar_math", "events_sessionize",
    "events_asof_join", "events_range_join", "pipeline_corpus_curation",
    "streaming_window_counts", "streaming_dedup_exact",
    "source_avro_scan",
    # --- past the 50-cap: rest of the r3-era block in age order, so a
    # deeper sweep (or the r10 rebuild) starts from the oldest ---
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
