"""Interactive-shell tests (entry point A — the reference's
shell/impala_shell.py:181). The REPL is driven with a scripted stdin."""

from __future__ import annotations

import io

from minimised_impala_spark.engine import Engine
from minimised_impala_spark.shell import repl
from minimised_impala_spark.tables import register_tables


def _run(spark, script: str) -> str:
    engine = Engine(spark)
    out = io.StringIO()
    repl(engine, in_stream=io.StringIO(script), out=out)
    return out.getvalue()


def test_shell_select_and_quit(spark):
    out = _run(spark, "SELECT 1 AS one, 'x' AS s;\nquit\n")
    assert "engine>" in out  # prompt shown


def test_shell_multiline_statement(spark, sf_dir):
    register_tables(spark, sf_dir, ("nation",))
    out = _run(spark, "SELECT count(*) AS n\nFROM nation;\nexit\n")
    assert "ERROR" not in out


def test_shell_dialect_function(spark):
    # dialect functions are registered on Engine construction
    out = _run(spark, "SELECT strleft('hello', 2) AS s;\nquit\n")
    assert "ERROR" not in out


def test_shell_survives_bad_sql(spark):
    out = _run(spark, "SELECT FROM nowhere;\nSELECT 2 AS ok;\nquit\n")
    assert "ERROR:" in out  # bad statement reported...
    # ...and the loop continued to the prompt afterwards
    assert out.rstrip().endswith("engine>")


def test_shell_explain_command(spark):
    out = _run(spark, "explain SELECT 1 AS x\nquit\n")
    assert "Project" in out or "Scan" in out or "(1)" in out


def test_shell_profile_command(spark, sf_dir):
    register_tables(spark, sf_dir, ("nation",))
    out = _run(
        spark, "profile SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey\nquit\n"
    )
    assert "HashAggregate" in out
    assert "numOutputRows=" in out


def test_engine_profile_metrics_tree(spark, sf_dir):
    """profile() returns the executed adaptive plan with real metric
    values — scan rows match the table, exchange/aggregate present."""
    from minimised_impala_spark.engine import Engine

    register_tables(spark, sf_dir, ("nation",))
    eng = Engine(spark)
    txt = eng.profile("SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
    assert "Scan parquet" in txt and "numOutputRows=25" in txt
    assert "Exchange" in txt or "ShuffleQueryStage" in txt
    assert "HashAggregate" in txt
