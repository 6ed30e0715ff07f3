#!/usr/bin/env python
"""Per-operator sf0.1 → sf1 scale smoke (the round-protocol check that
catches quadratic stages before they reach SCALE.md claims).

Builds best-of-2 exec times per query at /root/testdata/sf0.1 and the
10x fixture (tools/make_sf1.py, default /tmp/mis_sf1), printing one
JSON line per query with the ratio. Ratios well above ~2-3x at 10x
data mean a stage scales super-linearly in the data (or the fixture's
verbatim 10x replication legitimately multiplied the op's true
workload — check output cardinalities before concluding; see
dedup_threshold_sweep's SCALE.md row for the worked example).

Usage: python tools/scale_smoke.py query_name [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zero_row_fail(name: str, row_counts: list[int], whitelist: set[str]) -> bool:
    """Zero-row guard (VERDICT r10 #6): a query that returned 0 rows at
    any probed scale produced a VACUOUS timing — the r10 streaming bug
    staged 0 input files at sf1 and every stream 'passed' on empty
    input. Fails unless the name is explicitly whitelisted (legitimate
    empty output at some fixture scale)."""
    return any(c == 0 for c in row_counts) and name not in whitelist


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: scale_smoke.py query [query ...]", file=sys.stderr)
        return 2
    sf1_dir = os.environ.get("MIS_SF1_DIR", "/tmp/mis_sf1")
    if not os.path.isdir(sf1_dir):
        print(f"missing 10x fixture {sf1_dir}: run tools/make_sf1.py first",
              file=sys.stderr)
        return 2

    from minimised_impala_spark.session import build_session
    from minimised_impala_spark.queries import load_all
    from minimised_impala_spark.queries.registry import fresh

    load_all()
    spark = build_session(
        app_name="scale-smoke",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Zero-row guard (VERDICT r10 #6): the r10 streaming bug staged 0
    # input files at sf1 and every timing "passed" on an empty stream —
    # the vacuous-green class at the scale axis. A query yielding 0
    # rows at ANY scale fails the smoke unless explicitly whitelisted
    # here (queries whose correct output is legitimately empty at some
    # fixture scale, with the reason).
    zero_row_ok: set[str] = set(
        filter(None, os.environ.get("MIS_SMOKE_ZERO_OK", "").split(","))
    )

    def best2(name: str, sf: str) -> tuple[float, list[int]]:
        # Row counts from EVERY run, not just the last (r11 ADVICE): the
        # reported best timing may come from run 1 while run 2's count is
        # what the zero-row guard judged — collect both so a 0-row run
        # fails the smoke regardless of which run was fastest.
        best = float("inf")
        rows: list[int] = []
        for _ in range(2):
            df = fresh(name)(spark, sf)
            t0 = time.perf_counter()
            rows.append(len(df.collect()))
            best = min(best, time.perf_counter() - t0)
        return best, rows

    failed = False
    for n in names:
        a, rows_a = best2(n, "/root/testdata/sf0.1")
        b, rows_b = best2(n, sf1_dir)
        zero = zero_row_fail(n, rows_a + rows_b, zero_row_ok)
        failed = failed or zero
        print(
            json.dumps(
                {
                    "q": n,
                    "sf0.1": round(a, 2),
                    "sf1": round(b, 2),
                    "x": round(b / a, 1) if a > 0 else None,
                    "rows_sf0.1": rows_a,
                    "rows_sf1": rows_b,
                    **({"FAIL": "zero rows (vacuous timing)"} if zero else {}),
                }
            ),
            flush=True,
        )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
