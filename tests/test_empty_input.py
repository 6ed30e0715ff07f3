"""Empty-input robustness: every operator family must degrade to an empty
(or well-defined) result on empty tables — at 100 TB, empty partitions
and freshly-truncated tables are routine, and a crash deep inside a
pipeline stage is the failure mode this pins against (e.g. a numpy
kernel vstack-ing an empty Arrow batch)."""

from __future__ import annotations

import glob
import shutil

import pytest

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import QUERIES
from minimised_impala_spark.tables import ALL_TABLES

load_all()

# one representative per family; all must return exactly 0 rows on an
# empty corpus (select_values/scalar constants excluded — they produce
# rows by construction)
EMPTY_ZERO = [
    "tpch_q1",
    "tpch_q3",
    "join_full_outer",
    "agg_rollup",
    "window_rank_suite",
    "sort_nulls_limit_offset",
    "set_union",
    "nested_explode_tokens",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "pipeline_near_dedup",
    "sim_cosine_topk",
    "sim_lsh_ann",
    "text_quality",
    "text_sample_stratified",
    "pipeline_corpus_curation",
    "pipeline_pii_redaction",
    "join_right_anti",
    "agg_histogram",
    "pipeline_decontaminate_bloom",
    "text_heavy_hitters",
    "events_rollup_hierarchy",
    "sim_knn_classify",
    "dedup_prefix_filter",
    "dedup_incremental",
    "text_chunk_overlap",
    "text_temperature_resample",
    "window_ignore_nulls",
    "text_countmin_hitters",
    "pipeline_merge_upsert",
    "agg_kll_quantiles",
    "dedup_edit_distance",
    "udtf_sentence_split",
    "udtf_longest_streak",
    "dedup_embedding_lsh",
    "text_bm25_topk",
    "text_bigram_lm",
    "sim_centroid_classify",
    "pipeline_corpus_diff",
    "join_salted_skew",
    "sim_kmeans_cluster",
    "dedup_semdedup",
    "dedup_paragraph",
    "text_quality_classifier",
    "text_ccnet_buckets",
    "events_pattern_match",
    "dedup_span_ngram",
    "events_pagerank_transitions",
    "text_weighted_sample",
    "text_dsir_importance",
    "events_time_decay",
    "agg_unpivot",
    "events_mad_anomaly",
    "sim_matryoshka_topk",
    "agg_winsorize",
    # round-7 ops (pipeline_schema_drift_report and dedup_threshold_sweep
    # are excluded: they emit fixed-height report rows by construction)
    "agg_kll_accuracy_report",
    "agg_theta_sketch_ops",
    "agg_hll_union_report",
    "agg_weighted_percentile",
    "events_markov_next_event",
    "events_burst_detection",
    "events_changepoint_cusum",
    "events_rfm_segmentation",
    "events_cohort_ltv",
    "events_multitouch_attribution",
    "events_survival_km",
    "events_interval_coverage",
    "events_ab_test_report",
    "events_autocorrelation",
    "events_velocity_flags",
    "events_bot_regularity",
    "sim_range_search",
    "text_stopword_profile",
    "text_word_cooccurrence",
    "text_zipf_fit",
    "text_code_detection",
    "dedup_cross_source",
    "dedup_normalized_exact",
    # late round-8 additions (text_padding_efficiency and
    # text_vocab_coverage_curve are excluded: their single_max / K-axis
    # arms are global aggregates that produce rows by construction,
    # like select_values)
    "text_quality_calibration",
    "text_kneser_ney_lm",
    "pipeline_source_overlap_matrix",
    "pipeline_embedding_drift",
    "text_heaps_fit",
    "pipeline_dedup_impact_report",
    "events_lifecycle_states",
    "events_engagement_histogram",
    "pipeline_shard_assignment",
    "events_attribution_time_decay",
    "text_entropy_rate",
    "pipeline_benford_audit",
    "pipeline_k_anonymity_audit",
    "dedup_cluster_size_histogram",
    "text_jsd_source_divergence",
    "events_degree_distribution",
    "multimodal_phash_neardup",
    "dedup_simhash",
    # round-9 additions (nested_tpch_order_topn excluded: its OUTER
    # unnest emits one NULL row per customer by construction, so an
    # empty CUSTOMER table — covered by tpch_q3 etc. — is its only
    # zero-row case and the LEFT join handles it via the same path)
    "tpch_q2",
    "tpch_q11",
    "nested_tpch_q20",
    "nested_tpch_q21",
]


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    stage = tmp_path_factory.mktemp("empty_stage")
    for t in ALL_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(str(stage / t))
        part = glob.glob(str(stage / t / "*.parquet"))[0]
        shutil.copy(part, str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize("name", EMPTY_ZERO)
def test_empty_input_yields_empty_result(spark, empty_dir, name):
    df = QUERIES[name](spark, empty_dir)
    assert df.count() == 0
    assert len(df.schema.fields) > 0  # schema still well-formed
