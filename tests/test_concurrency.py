"""Concurrent query execution — the operational slice of the reference's
admission control + scheduling (be/src/scheduling/admission-controller.cc,
simple-scheduler.cc) that applies to a Spark deployment: many sessions
submit simultaneously, the scheduler multiplexes them, every query
completes correctly, and FAIR pools isolate workloads.

Spark's answer is the job scheduler: concurrent actions from multiple
threads interleave; `spark.scheduler.mode=FAIR` plus per-thread
`spark.scheduler.pool` labels give weighted sharing (memory limits are the
memory manager's job — SURVEY scopes per-query admission out).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_concurrent_queries_shared_session(spark, sf_dir):
    """8 threads × distinct aggregations on one session — all results
    correct, no cross-talk."""
    import threading

    from minimised_impala_spark.tables import register_tables

    register_tables(spark, sf_dir, ("orders", "lineitem"))
    results: dict[int, int] = {}
    errors: list[Exception] = []

    def run(i: int) -> None:
        try:
            got = spark.sql(
                f"SELECT count(*) AS n FROM lineitem WHERE l_orderkey % 8 = {i}"
            ).collect()[0].n
            results[i] = got
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    total = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert sum(results.values()) == total
    assert len(results) == 8


def test_fair_scheduler_pools(tmp_path):
    """FAIR mode with per-thread pools (static conf → subprocess)."""
    driver = tmp_path / "drive.py"
    driver.write_text(
        textwrap.dedent(
            """
            import threading
            from pyspark.sql import SparkSession
            spark = (SparkSession.builder.master("local[4]")
                     .config("spark.ui.enabled", "false")
                     .config("spark.scheduler.mode", "FAIR")
                     .getOrCreate())
            spark.sparkContext.setLogLevel("ERROR")
            assert spark.sparkContext.getConf().get("spark.scheduler.mode") == "FAIR"
            out = {}
            def run(pool, i):
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
                out[pool] = spark.sql(
                    f"SELECT sum(id) AS s FROM range({(i + 1) * 100000})"
                ).collect()[0].s
            ts = [threading.Thread(target=run, args=(f"pool{i}", i)) for i in range(3)]
            [t.start() for t in ts]; [t.join(120) for t in ts]
            expect = {f"pool{i}": (n * (n - 1)) // 2
                      for i, n in ((i, (i + 1) * 100000) for i in range(3))}
            assert out == expect, (out, expect)
            print("FAIR_POOLS_OK")
            """
        )
    )
    res = subprocess.run(
        [sys.executable, str(driver)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=tmp_path,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "FAIR_POOLS_OK" in res.stdout


def test_sql_async_cancel(spark, sf_dir):
    """Query cancellation parity (impala-server.cc:999 CancelInternal;
    shell Ctrl-C): a long-running query submitted via sql_async is
    cancelled mid-flight and fails promptly with QueryCancelledError;
    the session stays healthy for the next query."""
    import time

    from minimised_impala_spark.engine import Engine, QueryCancelledError
    from minimised_impala_spark.tables import register_tables

    import pytest

    eng = Engine(spark)
    register_tables(spark, sf_dir, ("lineitem",))
    # A cartesian triple self-join is effectively unbounded at any sf.
    handle = eng.sql_async(
        "SELECT count(*) FROM lineitem a, lineitem b, lineitem c"
    )
    deadline = time.monotonic() + 30
    while not handle.running() and time.monotonic() < deadline:
        time.sleep(0.05)
    time.sleep(1.0)  # let stages actually launch
    t0 = time.monotonic()
    handle.cancel()
    with pytest.raises(QueryCancelledError):
        handle.result(timeout=30)
    assert time.monotonic() - t0 < 15, "cancel did not take effect promptly"
    assert not handle.running()
    # session is still usable
    assert spark.sql("SELECT 1 AS one").collect()[0]["one"] == 1


def test_sql_async_completes(spark, sf_dir):
    from minimised_impala_spark.engine import Engine
    from minimised_impala_spark.tables import register_tables

    eng = Engine(spark)
    register_tables(spark, sf_dir, ("nation",))
    handle = eng.sql_async("SELECT count(*) AS n FROM nation")
    rows = handle.result(timeout=60)
    assert rows[0]["n"] == 25
    assert not handle.running()


def test_observe_collects_inflight_metrics(spark, sf_dir):
    """df.observe(): named metrics computed DURING execution (one pass, no
    second job) — the engine's answer to the reference's per-operator
    runtime profile counters (be/src/util/runtime-profile.h): a pipeline
    can assert row counts / sums at an intermediate stage without
    re-scanning. The observation rides the existing plan at any scale."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    obs = Observation("ingest")
    gated = (
        docs.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.length("text")).alias("chars_in"),
        )
        .filter(F.length("text") >= 100)
    )
    kept = gated.count()
    m = obs.get
    assert m["rows_in"] == docs.count()
    assert m["chars_in"] > 0
    assert kept <= m["rows_in"]
