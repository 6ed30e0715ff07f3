#!/usr/bin/env python
"""Static plan audit over the whole registry: build each query's physical
plan (no execution) and flag structural hazards —

  - rescan:    more parquet scans of one fixture table than distinct
               consumers need (a shared seam being recomputed)
  - pyrow:     BatchEvalPython (row-at-a-time Python) anywhere
  - cartesian: CartesianProduct nodes
  - globalwin: a Window with an empty partition spec (single-task sort)
               reading something bigger than a bounded aggregate

Builders that execute bounded jobs by spec (streaming_, ddl_, source_,
udf/udtf, trained-model rows, iterative graph rows) are skipped: their
build cost/plans are execution artifacts, pinned elsewhere.

    python tools/plan_audit.py [name_prefix_filter]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_PREFIXES = ("streaming_", "ddl_", "source_", "udf_", "uda_", "udtf_",
                 "dialect_", "shell_", "hs2_")
SKIP_EXACT = {
    # run jobs at build (training collects / iterative algorithms /
    # physical state round trips)
    "sim_kmeans_cluster", "sim_pq_ann", "sim_ivfpq_ann", "sim_ivf_ann",
    "sim_diverse_sample", "sim_centroid_classify", "sim_knn_classify",
    "sim_mmr_rerank", "pipeline_incremental_stats", "events_pagerank",
    "pipeline_near_dedup", "dedup_cluster", "events_connected_components",
    "text_bpe_train", "pipeline_merge_upsert",
}


def main() -> int:
    flt = sys.argv[1] if len(sys.argv) > 1 else ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from minimised_impala_spark.queries import load_all
    from minimised_impala_spark.queries.registry import QUERIES, fresh

    load_all()
    flagged: dict[str, list[str]] = {}
    n_checked = 0
    for name in QUERIES:
        if flt and flt not in name:
            continue
        if name.startswith(SKIP_PREFIXES) or name in SKIP_EXACT:
            continue
        try:
            spark.catalog.clearCache()
            df = fresh(name)(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            flagged.setdefault(name, []).append(f"ERROR {type(ex).__name__}")
            continue
        n_checked += 1
        flags = []
        # per-table scan counts. A persisted subtree's plan is PRINTED
        # once per consuming InMemoryTableScan, so raw line counts
        # over-count cached scans — but those prints carry the SAME
        # expression ids, while genuinely separate scans get fresh ids.
        # Dedupe on (output-attribute signature, table).
        seen = set()
        scans: dict[str, int] = {}
        for m in re.finditer(
            r"FileScan parquet (\[[^\]]*\])[^\n]*file:[^\]\n]*/(\w+)\.parquet",
            plan,
        ):
            key = (m.group(1), m.group(2))
            if key in seen:
                continue
            seen.add(key)
            scans[m.group(2)] = scans.get(m.group(2), 0) + 1
        for tbl, cnt in scans.items():
            if cnt > 2:
                flags.append(f"rescan:{tbl}x{cnt}")
        if "BatchEvalPython" in plan:
            flags.append("pyrow")
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        for m in re.finditer(r"Window \[[^\n]*windowspecdefinition\((?:[a-z_]+\#\d+L? ASC|[^,)]*specifiedwindowframe)", plan):
            pass  # partition-less windows need the spec's first arg checked
        if re.search(r"windowspecdefinition\(spec", plan):
            flags.append("globalwin")
        if flags:
            flagged[name] = flags
    print(f"checked {n_checked} plans")
    for name, flags in sorted(flagged.items()):
        print(f"{name:40s} {' '.join(flags)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
