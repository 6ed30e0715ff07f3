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


def test_shell_renders_result_grid(spark):
    out = _run(spark, "SELECT 41 + 1 AS answer;\nquit\n")
    assert "answer" in out and "42" in out
    assert "ERROR" not in out


def test_shell_ctrl_c_cancels_and_keeps_session(spark, sf_dir, monkeypatch):
    """A KeyboardInterrupt mid-statement cancels the query (reference
    Ctrl-C path) and the REPL stays alive for the next statement."""
    import minimised_impala_spark.shell as sh
    from minimised_impala_spark.engine import Engine

    engine = Engine(spark)
    interrupted = {"n": 0}
    orig_result = sh.Engine.sql_async

    class FakeHandle:
        def __init__(self, real):
            self.real = real

        def result(self, timeout=None):
            if interrupted["n"] == 0:
                interrupted["n"] += 1
                raise KeyboardInterrupt()
            return self.real.result(timeout)

        def cancel(self):
            self.real.cancel()

    def fake_async(self, text):
        return FakeHandle(orig_result(self, text))

    monkeypatch.setattr(sh.Engine, "sql_async", fake_async)
    import io

    out = io.StringIO()
    sh.repl(
        engine,
        in_stream=io.StringIO("SELECT 1 AS x;\nSELECT 7 AS y;\nquit\n"),
        out=out,
    )
    text = out.getvalue()
    assert "Cancelled" in text
    assert "y" in text and "7" in text  # session survived, next stmt ran


def test_shell_batch_query_mode(spark, sf_dir):
    """Reference -q mode: statements in, results out, no REPL."""
    import io

    from minimised_impala_spark.shell import _split_statements, run_batch

    register_tables(spark, sf_dir, ("nation",))
    engine = Engine(spark)
    out = io.StringIO()
    code = run_batch(
        engine,
        _split_statements(
            "SELECT count(*) AS n FROM nation; SELECT 1 AS one"
        ),
        out,
    )
    assert code == 0
    assert "| n " in out.getvalue() and "| one " in out.getvalue()


def test_shell_batch_delimited_output(spark, sf_dir):
    """Reference -B --output_delimiter: machine-readable rows, no grid."""
    import io

    from minimised_impala_spark.shell import run_batch

    register_tables(spark, sf_dir, ("region",))
    engine = Engine(spark)
    out = io.StringIO()
    code = run_batch(
        engine,
        ["SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"],
        out,
        delimited=True,
        delimiter="|",
    )
    assert code == 0
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 5 and lines[0].startswith("0|")
    assert "+" not in out.getvalue()  # no grid furniture


def test_shell_batch_error_exit_code(spark):
    import io

    from minimised_impala_spark.shell import run_batch

    engine = Engine(spark)
    out = io.StringIO()
    code = run_batch(engine, ["SELECT * FROM definitely_missing_tbl"], out)
    assert code == 1 and "ERROR" in out.getvalue()


def test_shell_variable_substitution():
    """Reference --var / ${VAR:name} substitution
    (shell/impala_shell.py:426): case-insensitive names, unknown vars
    error, escaped placeholders pass through."""
    import pytest

    from minimised_impala_spark.shell import substitute_vars

    out = substitute_vars(
        "SELECT ${VAR:lo} + ${var:HI} AS s", {"LO": "1", "hi": "2"}
    )
    assert out == "SELECT 1 + 2 AS s"
    with pytest.raises(KeyError):
        substitute_vars("SELECT ${VAR:nope}", {})
