"""Registry invariants — one authoritative count, asserted loudly.

VERDICT r5 found three disagreeing registry counts in the docs (209 /
208 / actual 243). This test is the single source of truth: update
EXPECTED_QUERY_COUNT when adding queries, and keep any prose counts
pointing here instead of restating the number.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_QUERY_COUNT = 317  # r8 late adds (21): see the r9 block at the head of __spark_entry__._PRIORITY


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
    # row through r7 (the r8 additions) plus the full r1-era rotation
    # debt — guards against queue re-ordering regressions
    import __spark_entry__ as entrymod

    never = {
        "pipeline_quality_scorecard", "pipeline_partition_skew_report",
        "pipeline_compaction_plan", "events_rolling_active",
        "text_readability_scores",
    }
    r1_debt = {
        "tpcds_q27_rollup_star", "tpcds_q68_order_detail",
        "tpcds_q51_cumulative_compare", "tpcds_q6_price_above_type_avg",
        "tpcds_q8_intersect_gate", "join_right_outer", "join_right_semi",
        "join_left_anti", "join_cross", "join_theta", "agg_stats",
        "agg_group_concat", "agg_percentile_exact", "agg_having",
    }
    first50 = set(list(entrymod.queries())[:50])
    assert never <= first50, f"missing from cap: {never - first50}"
    assert r1_debt <= first50, f"rotation debt cut: {r1_debt - first50}"
