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
    # the first 50 driver slots must include (r10 queue): the rows whose
    # code changed this round, every never-driver-verified registration
    # (the 12 TPC-DS promotions), and the COMPLETE r3-era rotation block
    # (VERDICT r9 #1: nothing older than r4 may remain) — guards against
    # queue re-ordering regressions
    import __spark_entry__ as entrymod

    r10_changed = {
        "tpch_q1",                 # isum BIGINT -> DECIMAL(38,0)
        "events_triangle_count",   # localCheckpoint -> persist seam
        "dedup_threshold_sweep",   # localCheckpoint -> persist seam
        # late-r10 sf1-oracle-sweep fixes
        "nested_tpch_pricing",     # disc-price sum -> decimal cents
        "agg_winsorize",           # raw/winsor sums -> decimal cents
        "nested_tpch_q21",         # GROUP BY s_name (oracle semantics)
        "streaming_sliding_counts",   # stream stage part-file fix
        "streaming_session_window",   # stream stage part-file fix
    }
    never = {
        "tpcds_q7", "tpcds_q19", "tpcds_q34", "tpcds_q42", "tpcds_q43",
        "tpcds_q46", "tpcds_q52", "tpcds_q55", "tpcds_q63", "tpcds_q79",
        "tpcds_q89", "tpcds_q96",
    }
    r3_era = {
        "source_sequencefile_scan", "agg_minmax_types",
        "set_union_distinct", "agg_cube_grouping", "agg_bitwise",
        "window_range_frame", "window_first_last",
        "subq_exists_correlated", "subq_in_disjunction",
        "nested_explode_outer", "nested_tpch_q18", "nested_tpch_pricing",
        "nested_exists_predicate", "nested_tpch_double_unnest",
        "events_window_agg", "events_json_extract", "events_funnel",
        "events_funnel_ordered", "events_retention", "events_gapfill",
        "events_zscore_anomaly", "events_path_mining",
        "dedup_ngram_jaccard", "dedup_keep_best", "sim_lsh_buckets",
        "sim_quantized_topk", "text_langid", "text_tokens",
        "text_fingerprint", "text_sample_deterministic",
    }
    first50 = set(list(entrymod.queries())[:50])
    assert r10_changed <= first50, f"changed cut: {r10_changed - first50}"
    assert never <= first50, f"missing from cap: {never - first50}"
    assert r3_era <= first50, f"rotation debt cut: {r3_era - first50}"
