"""Registry invariants — one authoritative count, asserted loudly.

VERDICT r5 found three disagreeing registry counts in the docs (209 /
208 / actual 243). This test is the single source of truth: update
EXPECTED_QUERY_COUNT when adding queries, and keep any prose counts
pointing here instead of restating the number.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_QUERY_COUNT = 332  # r10: +12 TPC-DS parity promotions (q7 q19 q34 q42 q43 q46 q52 q55 q63 q79 q89 q96)


def test_registry_count_is_authoritative():
    from minimised_impala_spark.queries import load_all
    from minimised_impala_spark.queries.registry import ORACLES, QUERIES

    load_all()
    assert len(QUERIES) == EXPECTED_QUERY_COUNT, (
        f"registry holds {len(QUERIES)} queries; update "
        f"EXPECTED_QUERY_COUNT (and any prose counts) to match"
    )
    assert set(ORACLES) <= set(QUERIES)


def test_priority_names_all_registered():
    # a typo'd name in _PRIORITY would silently burn a driver slot
    import __spark_entry__ as entrymod
    from minimised_impala_spark.queries.registry import QUERIES

    missing = [n for n in entrymod._PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert len(set(entrymod._PRIORITY)) == len(entrymod._PRIORITY), "dupes"


def test_priority_covers_never_verified_first():
    # the first 50 driver slots must include (r11 queue): the rows whose
    # code changed this round (deg-broadcast hint removal) and the
    # COMPLETE r4-era rotation block (VERDICT r10 #4: nothing older
    # than r5 may remain) — guards against queue re-ordering regressions
    import __spark_entry__ as entrymod

    r11_changed = {
        "events_triangle_count",       # F.broadcast(deg) hint removed
        "events_link_prediction",      # F.broadcast(deg) hint removed
        "events_degree_distribution",  # shares _orient_edges lineage
        "events_cohort_ltv",           # sf1 sweep fix: cents accumulation
        "tpch_q1",                     # sf10 fix: isum on all revenue sums
    }
    # events_ab_test_report also changed (hint-only, invariance-proven);
    # it holds slot 51, first in line for the r12 gate
    r4_era = {
        "agg_corr_covar", "window_percentile", "nested_array_funcs",
        "dedup_embedding", "text_repetition", "text_mix_sources",
        "text_contamination", "text_boilerplate_ngrams",
        "pipeline_pii_redaction", "streaming_attribution_join",
        "streaming_enrich_join", "streaming_sessionize_stateful",
        "multimodal_decode_stub", "multimodal_frame_sample",
        "join_right_anti", "agg_histogram", "text_split_assignment",
        "text_global_shuffle", "text_sample_stratified",
        "pipeline_near_dedup", "udf_pandas_scalar", "uda_grouped_pandas",
        "ddl_ctas_roundtrip", "source_json_scan", "source_orc_scan",
        "streaming_foreach_batch_sink", "pipeline_decontaminate_bloom",
        "streaming_dedup_watermarked", "streaming_outer_join",
        "text_heavy_hitters", "events_rollup_hierarchy",
        "dedup_prefix_filter", "dedup_incremental",
        "multimodal_resize_stub", "multimodal_features", "text_lm_score",
        "text_chunk_overlap", "text_temperature_resample",
        "window_ignore_nulls", "text_countmin_hitters",
        "pipeline_merge_upsert", "sim_pq_ann", "agg_kll_quantiles",
        "streaming_topk_windowed", "dedup_edit_distance",
    }
    first50 = set(list(entrymod.queries())[:50])
    assert r11_changed <= first50, f"changed cut: {r11_changed - first50}"
    assert r4_era <= first50, f"rotation debt cut: {r4_era - first50}"
