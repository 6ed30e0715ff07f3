#!/usr/bin/env python
"""Fresh-seed differential fuzz sweep over the window/frame generators.

The in-suite differential tests (tests/test_random_differential.py) pin
FIXED seeds so CI is reproducible; this sweep drives the same generators
with FRESH seeds to hunt for engine disagreement beyond the pinned
corpus — the reference's discrepancy_searcher.py ran in exactly this
mode (generate → run on both engines → diff → log).

Usage:  python tools/fuzz_sweep.py [n_queries] [base_seed]
Prints one line per mismatch and a final summary; exit code 1 on any
mismatch. Results are logged to NOTES.md by hand per round.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.randrange(1 << 30)

    from minimised_impala_spark.session import build_session
    from minimised_impala_spark.tables import register_tables
    from tests.oracle import canon_rows, duckdb_connect
    from tests.test_random_differential import (
        _gen_date_fn_query,
        _gen_dialect_pair,
        _gen_distinct_agg_query,
        _gen_events_query,
        _gen_filter_clause_query,
        _gen_frame_query,
        _gen_json_query,
        _gen_nested_query,
        _gen_outer_join_query,
        _gen_partsupp_query,
        _gen_query,
        _gen_rollup_query,
        _gen_setop_query,
        _gen_star_join_query,
        _gen_string_fn_query,
        _gen_subquery_query,
        _gen_window_query,
        to_duck_dialect,
    )

    sf_dir = os.environ.get("MIS_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = build_session(
        app_name="mis-fuzz-sweep",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    register_tables(
        spark,
        sf_dir,
        ("orders", "lineitem", "customer", "events", "documents", "part", "supplier"),
    )

    # Weighted toward the window/frame generators (the r5 focus), with the
    # other branches mixed in for breadth.
    gens = [
        (_gen_frame_query, 4),
        (_gen_window_query, 3),
        (_gen_events_query, 1),
        (_gen_query, 1),
        (_gen_outer_join_query, 1),
        (_gen_rollup_query, 1),
        (_gen_setop_query, 2),
        (_gen_subquery_query, 2),
        (_gen_string_fn_query, 2),
        (_gen_date_fn_query, 2),
        (_gen_distinct_agg_query, 2),
        (_gen_star_join_query, 2),
        (_gen_filter_clause_query, 2),
        (_gen_nested_query, 3),
        (_gen_json_query, 2),
        (_gen_dialect_pair, 2),
        (_gen_partsupp_query, 2),
    ]
    # optional branch-only mode: `fuzz_sweep.py N SEED dialect` restricts
    # the pool to the dialect-pair generator (r7 directive: ≥100 fresh
    # seeds on the QUALIFY/named-WINDOW/LATERAL VIEW surface alone)
    branch = sys.argv[3] if len(sys.argv) > 3 else None
    if branch == "dialect":
        gens = [(_gen_dialect_pair, 1)]
    pool = [g for g, w in gens for _ in range(w)]

    from minimised_impala_spark.engine import Engine

    engine = Engine(spark)
    con = duckdb_connect(sf_dir)
    mismatches = 0
    try:
        for i in range(n):
            rng = random.Random(base_seed + i)
            res = rng.choice(pool)(rng)
            if isinstance(res, tuple):
                # dialect pair: engine text may be non-ANSI (QUALIFY,
                # LATERAL VIEW) — run through Engine.sql (translate)
                sql, duck_sql = res
                sdf = engine.sql(sql)
            else:
                sql, duck_sql = res, to_duck_dialect(res)
                sdf = spark.sql(sql)
            s_rows = canon_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
            cur = con.execute(duck_sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = canon_rows(d_cols, [tuple(r) for r in cur.fetchall()])
            if s_rows != d_rows:
                mismatches += 1
                print(f"MISMATCH seed={base_seed + i}: {sql}")
    finally:
        con.close()

    print(
        f"fuzz_sweep: {n} queries, base_seed={base_seed}, "
        f"sf_dir={sf_dir}, mismatches={mismatches}"
    )
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
