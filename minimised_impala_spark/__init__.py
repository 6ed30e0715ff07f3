"""minimised_impala_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (a minimised Apache Impala snapshot at /root/reference/), built
Spark-first: the DataFrame/SQL API declares logical plans, Catalyst +
Tungsten pick physical strategies, and custom operators exist only where
Spark's built-ins genuinely can't express the semantics.

Public entry points:
  Engine (engine.py)     — .sql() in the reference dialect, .explain()
  build_session          — SparkSession factory with engine config presets
  register_tables        — fixture-table registration
  shell (python -m minimised_impala_spark.shell) — interactive REPL

Layout:
  session.py     — SparkSession factory with engine config presets
  tables.py      — testdata table registration (TPC-H-ish star schema)
  engine.py      — Engine facade (dialect SQL execution)
  dialect.py     — Impala-SQL → Spark-SQL translation
  functions/     — scalar function parity layer (SURVEY §2.8)
  operators/     — custom relational operators (skew-salted join/agg)
  sources/       — file-format sources/sinks (text/json/parquet/avro)
  queries/       — the declared query suite (TPC-H-ish + operator coverage)
  extensions/    — training-data pipeline ops: dedup, similarity, text,
                   multimodal
  streaming/     — Structured Streaming operators (extension; reference has
                   no streams — SURVEY §1.1)

Coverage map vs the reference's operator inventory: COVERAGE.md.
"""

__version__ = "0.1.0"

from minimised_impala_spark.session import build_session, local_test_session  # noqa: E402,F401

__all__ = ["build_session", "local_test_session", "__version__"]
