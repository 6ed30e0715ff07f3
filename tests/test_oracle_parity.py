"""Differential test: every registered query with an oracle hash-matches
DuckDB at the test scale factor. This is the local mirror of the driver's
t2 correctness gate."""

from __future__ import annotations

import pytest

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import ORACLES, QUERIES

from tests.oracle import compare

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name: str, spark, sf_dir: str):
    res = compare(name, spark, sf_dir, QUERIES[name], ORACLES[name])
    assert res["ok"], res


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name: str, spark, sf_dir: str):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
