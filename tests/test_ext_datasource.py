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


def test_data_source_ddl_verbs(spark):
    """CREATE/SHOW/DROP DATA SOURCE (CreateDataSrcStmt.java,
    sql-parser.cup:1183): catalog round trip, LIKE filtering, and the
    importable-class path actually registering the Python DataSource so
    reads work immediately."""
    import pytest

    from minimised_impala_spark.engine import Engine

    eng = Engine(spark)
    out = eng.sql(
        "CREATE DATA SOURCE kvsrc LOCATION '/ignored' "
        "CLASS 'minimised_impala_spark.sources.ext_kv.ExtKVDataSource' "
        "API_VERSION 'V1'"
    ).collect()
    assert "created" in out[0][0]
    rows = eng.sql("SHOW DATA SOURCES").collect()
    assert [r["name"] for r in rows] == ["kvsrc"]
    assert rows[0]["class"].endswith("ExtKVDataSource")
    # the registered source is immediately readable
    n = (
        spark.read.format("ext_kv")
        .option("rows", "100")
        .option("partitions", "2")
        .load()
        .count()
    )
    assert n == 100
    # LIKE pattern + duplicate/missing handling
    assert eng.sql("SHOW DATA SOURCES LIKE 'kv*'").count() == 1
    assert eng.sql("SHOW DATA SOURCES LIKE 'zz*'").count() == 0
    with pytest.raises(Exception):
        eng.sql(
            "CREATE DATA SOURCE kvsrc LOCATION '/x' CLASS 'a.B' API_VERSION 'V1'"
        )
    eng.sql(
        "CREATE DATA SOURCE IF NOT EXISTS kvsrc LOCATION '/x' "
        "CLASS 'a.B' API_VERSION 'V1'"
    )  # no-op, keeps original class
    assert eng.sql("SHOW DATA SOURCES").collect()[0]["class"].endswith("ExtKVDataSource")
    eng.sql("DROP DATA SOURCE kvsrc")
    assert eng.sql("SHOW DATA SOURCES").count() == 0
    with pytest.raises(Exception):
        eng.sql("DROP DATA SOURCE kvsrc")
    eng.sql("DROP DATA SOURCE IF EXISTS kvsrc")  # no-op
