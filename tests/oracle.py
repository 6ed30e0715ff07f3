"""DuckDB differential oracle runner.

Mirrors the driver's t2 protocol (FIXTURES.md §5): run the engine query on
PySpark and the oracle SQL on DuckDB over the same parquet files, then
canonicalize both results (columns sorted by name, rows sorted unless the
query has a top-level ORDER BY — we always sort since sorting a result that
is already ordered is a no-op for set equality —, doubles rounded to 9
significant digits, NULL as sentinel) and compare.

Reference precedent: the randomized differential framework in
tests/comparison/discrepancy_searcher.py (vs Postgres/MySQL).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from minimised_impala_spark.tables import ALL_TABLES

_SENTINEL = "\x00NULL\x00"


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v: object) -> object:
    if v is None:
        return _SENTINEL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return float(f"{v:.9g}")
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.replace(microsecond=(v.microsecond // 1000) * 1000).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def compare(name: str, spark, sf_dir: str, query_fn, oracle_sql: str) -> dict:
    """Run engine + oracle; return a result dict (ok/counts/diffs)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        d_cols = [d[0] for d in cur.description]
        d_rows = [tuple(r) for r in cur.fetchall()]
    finally:
        con.close()

    result = {
        "name": name,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
    }
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    result["rows_match"] = cs == cd
    result["ok"] = result["cols_match"] and result["rows_match"]
    if not result["ok"]:
        only_s = [r for r in cs if r not in cd][:5]
        only_d = [r for r in cd if r not in cs][:5]
        result["only_spark"] = only_s
        result["only_duck"] = only_d
    return result
