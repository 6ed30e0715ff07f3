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
    # The driver's hash is full-precision on floats and -0.0-sensitive
    # (r3 evidence, NOTES.md): strict_match is the signal that predicts
    # its verdict, so a query passing only the 9-sig-digit canon fails CI.
    assert res["strict_match"], {**res, "why": "float bits differ from oracle"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name: str, spark, sf_dir: str):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
