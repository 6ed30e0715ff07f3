"""Differential test of the QUALIFY dialect rewrite: random QUALIFY
statements run through Engine.sql (dialect._rewrite_qualify → Spark) and
through DuckDB's NATIVE QUALIFY support — the rewriter's output must be
semantically identical to an engine that implements the clause directly.
Exercises the r6 masked-rewrite paths: aliases referenced in the
predicate (inlined), qualified base-column refs (not inlined), string
literals containing alias-like tokens, rank functions, and tails."""

from __future__ import annotations

import random

import pytest

from tests.oracle import canon_rows, duckdb_connect

_WINFNS = [
    ("row_number()", "rn"),
    ("rank()", "rk"),
    ("dense_rank()", "dr"),
]


def _gen(rng: random.Random) -> str:
    fn, alias = rng.choice(_WINFNS)
    part = rng.choice(["o_custkey", "o_orderstatus", "o_orderpriority"])
    k = rng.randint(1, 4)
    thr = rng.randint(50, 900)
    order = rng.choice(
        ["o_totalprice DESC, o_orderkey", "o_orderdate, o_orderkey",
         "o_orderkey"]
    )
    kind = rng.random()
    if kind < 0.4:
        # alias referenced in QUALIFY (inlining path)
        return (
            f"SELECT o_orderkey, o_custkey, "
            f"{fn} OVER (PARTITION BY {part} ORDER BY {order}) AS {alias} "
            f"FROM orders WHERE o_custkey < {thr} "
            f"QUALIFY {alias} <= {k} ORDER BY o_orderkey"
        )
    if kind < 0.6:
        # raw window expression in the predicate (no alias involved)
        return (
            f"SELECT o_orderkey, o_orderstatus FROM orders "
            f"WHERE o_custkey < {thr} "
            f"QUALIFY {fn} OVER (PARTITION BY {part} ORDER BY {order}) = 1 "
            f"ORDER BY o_orderkey"
        )
    if kind < 0.8:
        # alias + extra non-window conjunct with a string literal that
        # contains the alias token (must NOT be inlined)
        st = rng.choice(["F", "O", "P"])
        return (
            f"SELECT o_orderkey, o_orderstatus, "
            f"{fn} OVER (PARTITION BY {part} ORDER BY {order}) AS {alias} "
            f"FROM orders WHERE o_custkey < {thr} "
            f"QUALIFY {alias} <= {k} AND o_orderstatus <> '{alias}' "
            f"AND o_orderstatus = '{st}' ORDER BY o_orderkey"
        )
    # LIMIT tail after QUALIFY
    lim = rng.randint(5, 50)
    return (
        f"SELECT o_orderkey, "
        f"{fn} OVER (PARTITION BY {part} ORDER BY {order}) AS {alias} "
        f"FROM orders WHERE o_custkey < {thr} "
        f"QUALIFY {alias} <= {k} ORDER BY o_orderkey LIMIT {lim}"
    )


_RNG = random.Random(20260815)
QUERIES = [_gen(_RNG) for _ in range(30)]


@pytest.mark.parametrize("idx", range(len(QUERIES)))
def test_qualify_differential(spark, sf_dir, idx):
    from minimised_impala_spark.engine import Engine
    from minimised_impala_spark.tables import register_tables

    sql = QUERIES[idx]
    register_tables(spark, sf_dir, ("orders",))
    sdf = Engine(spark).sql(sql)
    s_rows = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(sql)  # DuckDB parses QUALIFY natively
        d_rows = canon_rows(
            [d[0] for d in cur.description], [tuple(r) for r in cur.fetchall()]
        )
    finally:
        con.close()
    assert s_rows == d_rows, f"mismatch for: {sql}"
