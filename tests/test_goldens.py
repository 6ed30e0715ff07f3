"""Golden-file query tests — the reference's primary test pattern
(SURVEY §5.1: `.test` files with ---- QUERY / ---- TYPES / ---- RESULTS
sections, e.g. testdata/workloads/functional-query/queries/QueryTest/
aggregation.test, driven by tests/query_test/*.py). Table-based goldens
were cross-verified against DuckDB when recorded."""

from __future__ import annotations

import pytest

from tests.goldens.runner import all_golden_files, parse_golden_file, run_case

_CASES = [(c.name, c) for f in all_golden_files() for c in parse_golden_file(f)]


@pytest.fixture(scope="module")
def golden_tables(spark, sf_dir):
    from minimised_impala_spark.functions.parity import register_sql_functions
    from minimised_impala_spark.tables import register_tables

    register_tables(spark, sf_dir)
    register_sql_functions(spark)
    return spark


@pytest.mark.parametrize("name,case", _CASES, ids=[n for n, _ in _CASES])
def test_golden(golden_tables, name, case, sf_dir):
    # table-based goldens bake sf0.001 values; VALUES-based cases are
    # sf-independent but a whole-suite run at another SF should skip the
    # file rather than fail with misleading diffs
    if "sf0.001" not in sf_dir and " FROM " in case.query.upper().replace("\n", " "):
        if "VALUES" not in case.query.upper():
            pytest.skip("table goldens are recorded at sf0.001")
    run_case(golden_tables, case)
