"""TPC-DS parity: the rest of the reference's tpcds workload.

The reference ships 25 TPC-DS query files + count.test
(testdata/workloads/tpcds/queries/). 16 shapes were registered oracle-gated
rows through r9 (queries/tpcds.py); the REMAINING 12 files were ported here
in r9 as inline oracle-compared parity tests and PROMOTED to registered
rows in r10 (queries/tpcds.py round-10 section) per VERDICT r9 #2 — so this
suite now drives the registered entries through the exact driver-gate
protocol (tests/oracle.compare, strict + zero-row guard) instead of
duplicating their bodies. Several of these files are deliberate near-twins
in the reference (q42/q52/q55 of q3; q63/q89 of q53; q34 of q73; q46/q79
of q68) — ported anyway so every tpcds workload file has a named, verified
counterpart; the adaptation per file is documented on each registration.

Scale notes: every port keeps the tpcds.py discipline — dims broadcast,
one keyed aggregate on the fact, window layers over |groups| rows only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import ORACLES, QUERIES
from minimised_impala_spark.tables import load_table
from tests.oracle import compare

load_all()

# The 12 reference files promoted to registry rows in r10.
_R10_TPCDS = [
    "tpcds_q7", "tpcds_q19", "tpcds_q34", "tpcds_q42", "tpcds_q43",
    "tpcds_q46", "tpcds_q52", "tpcds_q55", "tpcds_q63", "tpcds_q79",
    "tpcds_q89", "tpcds_q96",
]


@pytest.mark.parametrize("name", _R10_TPCDS)
def test_tpcds_registered_parity(name: str, spark, sf_dir):
    r = compare(name, spark, sf_dir, QUERIES[name], ORACLES[name])
    assert r["ok"] and r["strict_match"], (
        name, {k: r[k] for k in r if k != "diff"},
    )
    # zero-row audit: a green compare over an empty result proves nothing
    # (the r9 de-vacuousing class; this guard caught q79's first nation
    # IN-list empty at sf0.001 the day it was written)
    assert r["spark_rows"] >= 1, f"{name}: vacuous ({r['spark_rows']} rows)"


def test_tpcds_q96_count_nonzero(spark, sf_dir):
    # q96 emits a single aggregate row, so rows>=1 alone is weak — the
    # count itself must be non-zero for the compare to prove anything.
    assert QUERIES["tpcds_q96"](spark, sf_dir).collect()[0]["total"] > 0


# --------------------------------------------------------------------------
# count.test: the workload's smoke row-count file (kept as a test — a
# bare count(*) doesn't earn a registry slot).
def test_tpcds_count(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return li.agg(F.count(F.lit(1)).alias("n"))

    r = compare("tpcds_count", spark, sf_dir, q,
                "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem")
    assert r["ok"] and r["strict_match"]
