#!/usr/bin/env python
"""Synthesize an sf1-scale fixture from sf0.1 for the scale smoke.

The driver ships sf{0.001,0.01,0.1} only; the 10× set is built by
replicating sf0.1 ten times with all key columns shifted by a copy
offset, so per-copy join relationships (orders→customer,
lineitem→orders/part/supplier, …) are preserved and every join/agg
cardinality scales ~10× — the property a scale smoke needs. region and
nation stay single-copy (TPC-H dimensions are SF-invariant). Output goes
to /tmp (never into the read-only /root/testdata) and is used ONLY for
SCALE.md timing, never for correctness oracles.

Usage: python tools/make_sf1.py [out_dir] [copies]

``copies`` defaults to 10 (the sf1 fixture); pass 100 for the sf10
(100x) fixture used by the round-8 two-decade scale smoke.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10
OFF = 10_000_000  # key shift per copy — far above any sf0.1 key

# key columns to shift per table; absent tables copy through unchanged
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = {"region", "nation"}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mis_sf1"
    copies_n = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    from pyspark.sql import functions as F

    from minimised_impala_spark.session import build_session
    from minimised_impala_spark.tables import ALL_TABLES

    spark = build_session(
        app_name="mis-make-sf1",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")},
    )
    os.makedirs(out_dir, exist_ok=True)
    for t in ALL_TABLES:
        src = f"{SRC}/{t}.parquet"
        df = spark.read.parquet(src)
        if t in SINGLE_COPY:
            out = df
        else:
            out = None
        if out is not None:
            out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        else:
            # append in batches of <=10 copies: one 100-way union plan
            # OOMs the driver; per-batch appends keep the plan bounded
            dst = f"{out_dir}/{t}.parquet"
            mode = "overwrite"
            for lo in range(0, copies_n, 10):
                batch = []
                for i in range(lo, min(lo + 10, copies_n)):
                    c = df
                    for col in SHIFTS.get(t, []):
                        c = c.withColumn(col, F.col(col) + F.lit(i * OFF))
                    batch.append(c)
                b = batch[0]
                for c in batch[1:]:
                    b = b.unionByName(c)
                b.write.mode(mode).parquet(dst)
                mode = "append"
        print(t, spark.read.parquet(f"{out_dir}/{t}.parquet").count())


if __name__ == "__main__":
    main()
