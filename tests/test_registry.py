"""Registry invariants — one authoritative count, asserted loudly.

VERDICT r5 found three disagreeing registry counts in the docs (209 /
208 / actual 243). This test is the single source of truth: update
EXPECTED_QUERY_COUNT when adding queries, and keep any prose counts
pointing here instead of restating the number.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECTED_QUERY_COUNT = 291  # r7: + code_detection, bot_regularity


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
    # row through r6 (the r7 coverage goal) — guards against queue
    # re-ordering regressions
    import __spark_entry__ as entrymod

    never = {"events_link_prediction"}
    first50 = set(list(entrymod.queries())[:50])
    assert never <= first50, f"missing from cap: {never - first50}"
    assert list(entrymod.queries())[0] == "events_link_prediction"
