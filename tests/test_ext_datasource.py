"""Tests for the ext_kv Python DataSource — the engine's equivalent of
the reference's external data-source API (DataSourceScanNode,
ext-data-source/): partition planning, deterministic generation, and the
accepted-conjuncts filter-pushdown protocol."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from minimised_impala_spark.sources import ext_kv


def _read(spark, **opts):
    ext_kv.register(spark)
    r = spark.read.format("ext_kv")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_full_scan_deterministic(spark):
    df = _read(spark, rows=100, partitions=4)
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 100
    assert rows[7]["k"] == "k7" and rows[7]["v"] == 3.5
    assert rows[42]["k"] == "k2" and rows[42]["v"] == 21.0


def test_range_pushdown_narrows_scan(spark, tmp_path):
    trace = tmp_path / "push.json"
    df = _read(spark, rows=1000, partitions=4, pushdown_trace=trace).filter(
        (F.col("id") >= 600) & (F.col("id") < 700)
    )
    got = df.count()
    assert got == 100
    t = json.loads(trace.read_text())
    # pushFilters ran driver-side and narrowed the planned range
    assert t["lo"] == 600 and t["hi"] == 700
    assert len(t["accepted"]) == 2


def test_unsupported_filters_stay_in_plan(spark, tmp_path):
    trace = tmp_path / "push.json"
    df = _read(spark, rows=100, partitions=2, pushdown_trace=trace).filter(
        (F.col("id") < 50) & (F.col("k") == "k3")
    )
    rows = df.collect()
    # k-filter was NOT pushed (returned unsupported) yet still applied
    assert sorted(r["id"] for r in rows) == [3, 13, 23, 33, 43]
    t = json.loads(trace.read_text())
    assert t["hi"] == 50 and len(t["accepted"]) == 1


def test_equality_pushdown_single_row(spark):
    df = _read(spark, rows=1000, partitions=4).filter(F.col("id") == 77)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["k"] == "k7" and rows[0]["v"] == 38.5


def test_empty_range(spark):
    df = _read(spark, rows=100, partitions=4).filter(F.col("id") > 1000)
    assert df.count() == 0
