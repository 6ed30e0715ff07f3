#!/usr/bin/env python
"""Check whether a fresh second draw of a query silently reuses the
first draw's persisted intermediates via CacheManager plan matching.

For each named query: draw 1 (fresh build + collect), then draw 2
(fresh build), and inspect draw 2's executed plan for
InMemoryTableScan. A hit means best-of-N measures cache reads, not
query execution.

    python tools/cache_leak_check.py q1,q2,...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from minimised_impala_spark.session import local_test_session
    from minimised_impala_spark.queries import load_all
    from minimised_impala_spark.queries.registry import fresh
    from minimised_impala_spark.tables import ALL_TABLES, load_table

    load_all()
    spark = local_test_session("mis-cacheleak")
    for t in ALL_TABLES:
        load_table(spark, sf_dir, t)
    fresh("tpch_q6")(spark, sf_dir).collect()

    leaks = []
    for n in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df1 = fresh(n)(spark, sf_dir)
        df1.collect()
        t1 = time.perf_counter()
        df2 = fresh(n)(spark, sf_dir)
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        hit = "InMemoryTableScan" in plan2 or "InMemoryRelation" in plan2
        t2 = time.perf_counter()
        df2.collect()
        t3 = time.perf_counter()
        status = "LEAK" if hit else "ok"
        if hit:
            leaks.append(n)
        print(
            f"{n:34s} {status:4s} draw1={t1 - t0:.3f}s draw2={t3 - t2:.3f}s"
        )
    print("LEAKS:", leaks)
    return 1 if leaks else 0


if __name__ == "__main__":
    raise SystemExit(main())
