"""minimised_impala_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (a minimised Apache Impala snapshot at /root/reference/), built
Spark-first: the DataFrame/SQL API declares logical plans, Catalyst +
Tungsten pick physical strategies, and custom operators exist only where
Spark's built-ins genuinely can't express the semantics.

Layout:
  session.py     — SparkSession factory with engine config presets
  tables.py      — testdata table registration (TPC-H-ish star schema)
  functions/     — scalar/aggregate function parity layer (SURVEY §2.8)
  operators/     — relational operator implementations (SURVEY §2.1-2.9)
  queries/       — the declared query suite (TPC-H-ish + operator coverage)
  extensions/    — training-data pipeline ops: dedup, similarity, text
  streaming/     — Structured Streaming operators (extension; reference has
                   no streams — SURVEY §1.1)
"""

__version__ = "0.1.0"
