"""Pipeline-operations audit suite (round 8).

Three artifacts a 100 TB training-data pipeline gates a production run
on:

- ``pipeline_quality_scorecard`` — the capstone over the sketch-audit
  wing: every approximate operator's observed error, folded into ONE
  per-component error-budget report (the "can we ship this corpus"
  table).  Each input is itself a registered, driver-green audit query;
  this op only summarizes and unions their outputs, so its cost is the
  sum of audits it would be malpractice not to run anyway.
- ``pipeline_partition_skew_report`` — partition-layout planning:
  for each candidate partition key, the partition-count / row-balance
  statistics (max/avg ratio, CV, top-1 share) that decide whether a key
  is a viable physical layout at scale.  One keyed count per candidate,
  then |partitions|-bounded statistics — nothing corpus-sized leaves
  the first aggregate.
- ``pipeline_compaction_plan`` — the small-file planner: given the
  write layout (events day x type), compute per-partition target file
  counts for a byte budget, flagging partitions that would emit
  too-small files.  The per-partition math is pure projection over the
  |partitions|-bounded count table.

Reference parity: the reference exposes table/partition metadata via
SHOW PARTITIONS / COMPUTE STATS (fe/src/main/java/org/apache/impala/
analysis/ShowPartitionsStmt.java, ComputeStatsStmt.java); these reports
are the scale-planning layer a lakehouse pipeline builds on the same
numbers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# direct imports (not via load_all) so the scorecard's oracle can be
# composed from the component oracles regardless of import order
from minimised_impala_spark.extensions import dedup as _dedup  # noqa: F401
from minimised_impala_spark.extensions import similarity as _similarity  # noqa: F401
from minimised_impala_spark.queries import aggregates as _aggregates  # noqa: F401
from minimised_impala_spark.queries.registry import ORACLES, QUERIES, query
from minimised_impala_spark.streaming import stateful as _stateful  # noqa: F401
from minimised_impala_spark.tables import load_table

# --------------------------------------------------------------------------
# Quality scorecard: one row per approximate component, summarizing its
# audit report into (units, observed err in permille, budget, verdict).
# Budgets are spec constants of the engine (what the pipeline tolerates),
# not fixture-derived.  The ANN budget is deliberately loose: recall on
# a brute-force-vs-IVF comparison is corpus-dependent and its own report
# (sim_ann_recall_report) carries the per-query detail.
_SCORECARD_COMPONENTS = [
    # (component, source query, budget_permille)
    ("ann_ivf_recall", "sim_ann_recall_report", 600),
    ("cm_heavy_hitters", "streaming_cm_error_report", 100),
    ("hll_union", "agg_hll_union_report", 0),
    ("kll_quantiles", "agg_kll_accuracy_report", 25),
    ("kmv_distinct", "agg_kmv_distinct_report", 50),
    ("minhash_jaccard", "dedup_minhash_accuracy_report", 60),
]


def _scorecard_oracle() -> str:
    o = {name: ORACLES[src] for name, src, _ in _SCORECARD_COMPONENTS}
    summaries = {
        "minhash_jaccard": (
            "SELECT CAST(n_pairs AS BIGINT) AS n_units,\n"
            "       CAST(round(mean_abs_err * 1000) AS BIGINT) AS err_permille"
        ),
        "kmv_distinct": (
            "SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
            "       CAST(max(abs(rel_err_permille)) AS BIGINT) AS err_permille"
        ),
        "kll_quantiles": (
            "SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
            "       CAST(max(abs(rank_err_permille)) AS BIGINT) AS err_permille"
        ),
        "hll_union": (
            "SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
            "       CAST(round(1000.0 * sum(CASE WHEN within_5pct THEN 0 ELSE 1 END)\n"
            "                  / count(*)) AS BIGINT) AS err_permille"
        ),
        "cm_heavy_hitters": (
            "SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
            "       CAST(max(round(1000.0 * overshoot / exact_n)) AS BIGINT)\n"
            "         AS err_permille"
        ),
        "ann_ivf_recall": (
            "SELECT CAST(count(*) AS BIGINT) AS n_units,\n"
            "       CAST(1000 - round(avg(recall_pct) * 10) AS BIGINT)\n"
            "         AS err_permille"
        ),
    }
    parts = []
    for name, _src, budget in _SCORECARD_COMPONENTS:
        parts.append(
            f"SELECT '{name}' AS component, n_units, err_permille,\n"
            f"       CAST({budget} AS BIGINT) AS budget_permille,\n"
            f"       err_permille <= {budget} AS within_budget\n"
            f"FROM ({summaries[name]} FROM ({o[name]}) src) s"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY component"


def _summarize(df: DataFrame, component: str) -> DataFrame:
    if component == "minhash_jaccard":
        agg = df.select(
            F.col("n_pairs").cast("bigint").alias("n_units"),
            F.round(F.col("mean_abs_err") * 1000)
            .cast("bigint")
            .alias("err_permille"),
        )
    elif component == "kmv_distinct":
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.max(F.abs(F.col("rel_err_permille")))
            .cast("bigint")
            .alias("err_permille"),
        )
    elif component == "kll_quantiles":
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.max(F.abs(F.col("rank_err_permille")))
            .cast("bigint")
            .alias("err_permille"),
        )
    elif component == "hll_union":
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.round(
                1000.0
                * F.sum(F.when(F.col("within_5pct"), 0).otherwise(1))
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("err_permille"),
        )
    elif component == "cm_heavy_hitters":
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.max(F.round(1000.0 * F.col("overshoot") / F.col("exact_n")))
            .cast("bigint")
            .alias("err_permille"),
        )
    else:  # ann_ivf_recall
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            (1000 - F.round(F.avg("recall_pct") * 10))
            .cast("bigint")
            .alias("err_permille"),
        )
    return agg


@query("pipeline_quality_scorecard", oracle=_scorecard_oracle())
def pipeline_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for component, src, budget in _SCORECARD_COMPONENTS:
        summary = _summarize(QUERIES[src](spark, sf_dir), component)
        parts.append(
            summary.select(
                F.lit(component).alias("component"),
                "n_units",
                "err_permille",
                F.lit(budget).cast("bigint").alias("budget_permille"),
                (F.col("err_permille") <= budget).alias("within_budget"),
            )
        )
    return reduce(DataFrame.unionByName, parts).orderBy("component")


# --------------------------------------------------------------------------
# Partition-skew report.  Candidate keys are evaluated on the ratio
# stats a layout decision needs: a max/avg over ~3x says hot partitions
# will straggle; a top-1 share near 1000 permille says the key doesn't
# partition at all.  Each candidate costs one keyed count (map-side
# combined); the stats run over |partitions| rows.
_SKEW_ORACLE = """
WITH cand AS (
  SELECT 'events.event_type' AS part_key, event_type AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
  UNION ALL
  SELECT 'events.day', CAST(CAST(ts AS DATE) AS VARCHAR),
         CAST(count(*) AS BIGINT)
  FROM events GROUP BY CAST(ts AS DATE)
  UNION ALL
  SELECT 'lineitem.shipmonth', strftime(l_shipdate, '%Y-%m'),
         CAST(count(*) AS BIGINT)
  FROM lineitem GROUP BY strftime(l_shipdate, '%Y-%m')
  UNION ALL
  SELECT 'orders.ordermonth', strftime(o_orderdate, '%Y-%m'),
         CAST(count(*) AS BIGINT)
  FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
)
SELECT part_key,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(round(1000.0 * max(n) * count(*) / sum(n)) AS BIGINT)
         AS max_over_avg_permille,
       CAST(round(1000.0 * stddev_pop(n) * count(*) / sum(n)) AS BIGINT)
         AS cv_permille,
       CAST(round(1000.0 * max(n) / sum(n)) AS BIGINT) AS top1_share_permille
FROM cand
GROUP BY part_key
ORDER BY part_key
"""


@query("pipeline_partition_skew_report", oracle=_SKEW_ORACLE)
def pipeline_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def counts(df: DataFrame, part_key: str, kcol) -> DataFrame:
        return (
            df.groupBy(kcol.cast("string").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(part_key).alias("part_key"), "k", "n")
        )

    cand = (
        counts(ev, "events.event_type", F.col("event_type"))
        .unionByName(counts(ev, "events.day", F.col("ts").cast("date")))
        .unionByName(
            counts(li, "lineitem.shipmonth", F.date_format("l_shipdate", "yyyy-MM"))
        )
        .unionByName(
            counts(orders, "orders.ordermonth", F.date_format("o_orderdate", "yyyy-MM"))
        )
    )
    return (
        cand.groupBy("part_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.round(1000.0 * F.max("n") * F.count(F.lit(1)) / F.sum("n"))
            .cast("bigint")
            .alias("max_over_avg_permille"),
            F.round(1000.0 * F.stddev_pop("n") * F.count(F.lit(1)) / F.sum("n"))
            .cast("bigint")
            .alias("cv_permille"),
            F.round(1000.0 * F.max("n") / F.sum("n"))
            .cast("bigint")
            .alias("top1_share_permille"),
        )
        .orderBy("part_key")
    )


# --------------------------------------------------------------------------
# Compaction plan.  The writer layout is events partitioned by
# (day, event_type); estimated partition bytes = rows x an avg-row-width
# constant (the engine would read real file sizes from the catalog; the
# fixture has no file metadata, so the estimator is part of the spec).
# target_files = ceil(bytes / 128 MiB) — partitions whose bytes fall
# under 16 MiB are flagged for merge into sibling files.  Integer
# arithmetic end to end.
_ROW_WIDTH_BYTES = 64
_TARGET_FILE_BYTES = 128 * 1024 * 1024
_SMALL_FILE_BYTES = 16 * 1024 * 1024

_COMPACT_ORACLE = f"""
WITH parts AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) * {_ROW_WIDTH_BYTES} AS BIGINT) AS est_bytes
  FROM events GROUP BY CAST(ts AS DATE), event_type
)
SELECT day, event_type, n_rows, est_bytes,
       CAST(ceil(est_bytes * 1.0 / {_TARGET_FILE_BYTES}) AS BIGINT)
         AS target_files,
       est_bytes < {_SMALL_FILE_BYTES} AS needs_merge
FROM parts
ORDER BY day, event_type
"""


@query("pipeline_compaction_plan", oracle=_COMPACT_ORACLE)
def pipeline_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parts = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return parts.select(
        "day",
        "event_type",
        "n_rows",
        (F.col("n_rows") * _ROW_WIDTH_BYTES).cast("bigint").alias("est_bytes"),
        F.ceil(F.col("n_rows") * _ROW_WIDTH_BYTES * 1.0 / _TARGET_FILE_BYTES)
        .cast("bigint")
        .alias("target_files"),
        (F.col("n_rows") * _ROW_WIDTH_BYTES < _SMALL_FILE_BYTES).alias(
            "needs_merge"
        ),
    ).orderBy("day", "event_type")
