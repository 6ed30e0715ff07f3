#!/usr/bin/env python
"""Add-order invariance sweep (the ninth audit class, r9).

The driver's value hash is full-precision (tests/oracle.canon_rows_strict),
so a query is only robustly green if its output is BIT-IDENTICAL under any
physical plan Spark may pick — partial-agg tree shape, input split count
and shuffle partition count all change floating-point ADD ORDER. The k=6
dsum boundary found by tests/test_nested_tpch_parity.py (tpch_q1
sum_charge one scaled-ulp apart between two plans) is exactly this class.

This sweep runs every registered query TWICE at the gate scale under
deliberately different physical configs:

  pass A: shuffle.partitions=8,  default split size   (the dryrun config)
  pass B: shuffle.partitions=3,  maxPartitionBytes=256k, AQE off

and compares the strict-canonicalized row sets. A mismatch means the
query's output depends on plan shape — i.e. a determinism shim is missing
or out of margin — and WILL eventually flip a driver row when the driver's
parallelism differs from ours.

    python tools/invariance_sweep.py            # first 50 (driver cap)
    python tools/invariance_sweep.py 0 999      # everything
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF_A = {
    "spark.sql.shuffle.partitions": "8",
}
CONF_B = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.adaptive.enabled": "false",
}
# Pass C flips the JOIN-STRATEGY axis instead: auto-broadcast disabled, so
# every non-hinted join becomes SMJ/shuffle-hash (different build sides,
# different float accumulation order). Select with MIS_INVARIANCE_PASS=C.
CONF_C = {
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _session(conf: dict):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _collect(names: list[str], sf_dir: str, conf: dict) -> dict[str, object]:
    """One session pass: name -> strict canon rows (or ('ERROR', msg))."""
    spark = _session(conf)
    spark.sparkContext.setLogLevel("ERROR")
    # Guard against a silently-vacuous sweep: the restarted session must
    # actually carry this pass's configs.
    for k, v in conf.items():
        live = spark.conf.get(k)
        assert live == v, f"config {k} did not apply: {live!r} != {v!r}"
    print(f"  [session {spark.sparkContext.applicationId}: "
          f"shuffle.partitions={spark.conf.get('spark.sql.shuffle.partitions')}, "
          f"aqe={spark.conf.get('spark.sql.adaptive.enabled')}]", flush=True)
    import __spark_entry__ as entrymod
    from tests.oracle import canon_rows_strict

    qs = entrymod.queries()
    out: dict[str, object] = {}
    for n in names:
        t0 = time.time()
        try:
            df = qs[n](spark, sf_dir)
            out[n] = canon_rows_strict(list(df.columns), [tuple(r) for r in df.collect()])
            print(f"  {n:34s} {len(out[n]):6d} rows {time.time() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            out[n] = ("ERROR", str(ex).splitlines()[0][:160])
            print(f"  {n:34s} ERROR {out[n][1]}", flush=True)
    spark.stop()
    return out


def main() -> int:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sf_dir = os.environ.get("MIS_DRYRUN_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())[lo:hi]
    alt = CONF_C if os.environ.get("MIS_INVARIANCE_PASS") == "C" else CONF_B
    print(f"pass A ({CONF_A}) over {len(names)} queries at {sf_dir}")
    a = _collect(names, sf_dir, CONF_A)
    print(f"alt pass ({alt})")
    b = _collect(names, sf_dir, alt)

    bad: list[str] = []
    for n in names:
        ra, rb = a[n], b[n]
        if ra != rb:
            bad.append(n)
            if isinstance(ra, tuple) or isinstance(rb, tuple):
                print(f"DIVERGES {n}: A={ra if isinstance(ra, tuple) else len(ra)} "
                      f"B={rb if isinstance(rb, tuple) else len(rb)}")
            else:
                diffs = [
                    (x, y) for x, y in zip(ra, rb) if x != y
                ][:3]
                print(f"DIVERGES {n}: {len(ra)} vs {len(rb)} rows; first diffs: {diffs}")
    print("DIVERGENT:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
