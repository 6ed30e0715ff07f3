"""Registry invariants — one authoritative count, asserted loudly.

VERDICT r5 found three disagreeing registry counts in the docs (209 /
208 / actual 243). This test is the single source of truth: update
EXPECTED_QUERY_COUNT when adding queries, and keep any prose counts
pointing here instead of restating the number.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_QUERY_COUNT = 320  # r9: +nested_tpch_q20/q21, +nested_tpch_order_topn; tpch_q2/q11 REPLACED (derived partsupp)


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
    # the first 50 driver slots must include every name with no driver
    # row through r8 (the 21 late-r8 operators), the two late-r8
    # re-specs, r9's new/replaced queries, the r9 changed-code row, and
    # the 7 r2-era rows deferred by the r8 cap — guards against queue
    # re-ordering regressions
    import __spark_entry__ as entrymod

    never = {
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
        "events_hourly_seasonality", "dedup_simhash",
        "events_concurrency_curve",
    }
    r9_new_or_changed = {
        "tpch_q2", "tpch_q11", "nested_tpch_q20", "nested_tpch_q21",
        "nested_tpch_order_topn", "text_ccnet_buckets",
        # de-vacuoused (were green on empty results)
        "subq_scalar_uncorrelated", "subq_not_exists_correlated",
        "subq_in_aggregated", "tpch_q22", "join_left_anti",
    }
    r2_deferred = {
        "tpch_q1", "tpch_q3", "window_rank_suite", "window_rows_frame",
        "window_lag_lead", "dedup_minhash_lsh", "sim_ivf_ann",
    }
    first50 = set(list(entrymod.queries())[:50])
    assert never <= first50, f"missing from cap: {never - first50}"
    assert r9_new_or_changed <= first50, (
        f"new/changed cut: {r9_new_or_changed - first50}"
    )
    assert r2_deferred <= first50, f"rotation debt cut: {r2_deferred - first50}"
