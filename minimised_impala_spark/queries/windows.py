"""Window / analytic function coverage — reference AnalyticEvalNode
(be/src/exec/analytic-eval-node.h:58, planner fe/.../planner/
AnalyticPlanner.java): rank, dense_rank, row_number, percent_rank,
cume_dist, ntile, first_value, last_value, lag, lead, plus aggregates over
ROWS/RANGE frames (fe/.../analysis/AnalyticWindow.java:41-80).

All ORDER BY clauses carry a unique tiebreaker column so rank outputs and
frame contents are deterministic across engines. Frame sums over money
columns are rounded to their fixed-point scale (exact — see tpch.py).

Scale notes: every window here partitions by a key (custkey/userkey) —
Spark executes these with a single hash-partition shuffle + in-partition
sort, the same shape the reference used (sort + single-pass
AnalyticEvalNode). Unpartitioned windows (global ORDER BY) are avoided:
they serialize to one task at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import load_table


# --------------------------------------------------------------------------
@query(
    "window_rank_suite",
    oracle="""
SELECT o_custkey, o_orderkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       row_number()   OVER w AS rn,
       round(percent_rank() OVER w, 9) AS prnk,
       round(cume_dist()    OVER w, 9) AS cdist,
       ntile(4)       OVER w AS quartile
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey, rn
""",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
            F.round(F.percent_rank().over(w), 9).alias("prnk"),
            F.round(F.cume_dist().over(w), 9).alias("cdist"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# ROWS frame: moving sum/min over a sliding 3-row window + running total.
@query(
    "window_rows_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100) / 100
         AS moving_sum3,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100) / 100
         AS running_sum,
       min(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighborhood_min
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wb = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    m100 = lambda c: F.round(c * 100, 0) / 100  # noqa: E731
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            m100(F.sum("o_totalprice").over(wb.rowsBetween(-2, 0))).alias("moving_sum3"),
            m100(
                F.sum("o_totalprice").over(wb.rowsBetween(W.unboundedPreceding, 0))
            ).alias("running_sum"),
            F.min("o_totalprice").over(wb.rowsBetween(-1, 1)).alias("neighborhood_min"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# RANGE frame — the reference's default frame is RANGE UNBOUNDED
# PRECEDING..CURRENT ROW (AnalyticWindow.java:37-39): peers (ties in the
# ordering value) share the aggregate.
@query(
    "window_range_frame",
    oracle="""
SELECT o_custkey, o_orderdate, o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS n_upto_date
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("n_upto_date"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# lag/lead with offsets and defaults (BuiltinsDb.java:806-886).
@query(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       lag(o_totalprice)          OVER w AS prev_price,
       lag(o_totalprice, 2, -1.0) OVER w AS prev2_price,
       lead(o_totalprice)         OVER w AS next_price,
       lead(o_orderkey, 1, -1)    OVER w AS next_key
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.lead("o_orderkey", 1, -1).over(w).alias("next_key"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# first_value/last_value over an explicit frame.
@query(
    "window_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice)  OVER w AS latest_price
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("latest_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Top-K per group — the canonical row_number pattern (reference TopNNode is
# global-only; per-group top-k was expressed exactly this way).
@query(
    "window_topk_per_group",
    oracle="""
SELECT n_name, c_custkey, c_acctbal
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) t
WHERE rn <= 3
ORDER BY n_name, c_acctbal DESC, c_custkey
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy("n_name", F.desc("c_acctbal"), "c_custkey")
    )


# --------------------------------------------------------------------------
# Sort/limit coverage: ORDER BY with NULLS FIRST/LAST + LIMIT/OFFSET.
# Reference defaults: NULLS LAST for ASC, NULLS FIRST for DESC
# (fe/.../analysis/OrderByElement.java:109-111); OFFSET requires ORDER BY
# (fe/.../analysis/LimitElement.java). Spark 3.4+ has native OFFSET.
@query(
    "sort_nulls_limit_offset",
    oracle="""
SELECT o_orderkey, g
FROM (SELECT o_orderkey, nullif(o_custkey % 5, 3) AS g FROM orders
      WHERE o_orderkey < 2000) t
ORDER BY g ASC NULLS LAST, o_orderkey DESC
LIMIT 50 OFFSET 10
""",
)
def sort_nulls_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_custkey") % 5, F.lit(3)).alias("g"),
        )
        .orderBy(F.asc_nulls_last("g"), F.desc("o_orderkey"))
        .offset(10)
        .limit(50)
    )


# --------------------------------------------------------------------------
# Aggregate-over-window beyond the basic min/max/sum/count family:
# median/percentile as analytic functions ("any aggregate over a window",
# SURVEY §2.5 — the reference allowed its agg builtins analytically).
_PCTL_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       round(quantile_cont(o_totalprice, 0.5)
             OVER (PARTITION BY o_custkey), 4) AS cust_median,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey) * 100) / 100
         / count(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
FROM orders
WHERE o_custkey < 200
ORDER BY o_custkey, o_orderkey
"""


@query("window_percentile", oracle=_PCTL_ORACLE)
def window_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round(F.percentile("o_totalprice", F.lit(0.5)).over(w), 4).alias(
                "cust_median"
            ),
            # davg-style shim (see queries/tpch.py:50): a bare
            # round(avg() OVER w, 4) lost to window accumulation order in
            # r3 — the driver hash is full-precision, and a 1-ulp sum
            # difference flips the 4th decimal at a tie. round(sum·100)
            # is an exact integer-valued double (2-decimal money), so the
            # subsequent divisions are bit-identical on both engines.
            (
                F.round(F.sum("o_totalprice").over(w) * 100, 0) / 100
                / F.count("o_totalprice").over(w)
            ).alias("cust_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# RANGE frame with NUMERIC offsets (AnalyticWindow.java:41-80: `n
# PRECEDING/FOLLOWING` range bounds over a numeric ORDER BY — value
# distance, not row distance; rows with keys within ±window of the
# current row's key join the frame regardless of row position).
@query(
    "window_range_numeric",
    oracle="""
SELECT o_custkey, o_orderkey,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS n_near,
       CAST(sum(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS sum_upto
FROM orders
WHERE o_custkey < 60
ORDER BY o_custkey, o_orderkey
""",
)
def window_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w1 = W.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-50, 50)
    w2 = W.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, W.currentRow)
    return (
        orders.filter(F.col("o_custkey") < 60)
        .select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w1).alias("n_near"),
            F.sum("o_orderkey").over(w2).alias("sum_upto"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# IGNORE NULLS analytic variants (beyond the reference: the vendored
# Impala's AnalyticExpr — fe/.../analysis/AnalyticExpr.java:81-94 — has
# first_value/last_value but no IGNORE NULLS modifier; later Impala and
# ANSI added it, and it is the standard forward-fill idiom for sparse
# time-series). value is NULL'd on 'view' events, then:
#   ffill     — last non-null value at or before the current row
#   first_nn  — first non-null value in the whole partition
#   second_nn — nth_value(2) skipping nulls
# Pure value selection (no FP arithmetic), so doubles pass through
# bit-exact in both engines. Partitioned by user_id — one hash shuffle +
# in-partition sort, the scale-safe window shape.
@query(
    "window_ignore_nulls",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
  FROM events WHERE user_id < 40
)
SELECT event_id, user_id, v,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)  AS ffill,
       first_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nn,
       nth_value(v, 2 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_nn
FROM e
ORDER BY user_id, event_id
""",
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "view", F.lit(None)).otherwise(F.col("value"))
    wc = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        events.filter(F.col("user_id") < 40)
        .select("event_id", "user_id", v.alias("v"), "ts")
        .select(
            "event_id",
            "user_id",
            "v",
            F.last("v", ignorenulls=True).over(wc).alias("ffill"),
            F.first("v", ignorenulls=True).over(wf).alias("first_nn"),
            F.nth_value("v", 2, ignoreNulls=True).over(wf).alias("second_nn"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# DISTINCT aggregate over a window — cumulative count of distinct order
# priorities per customer. The reference's AnalyticEvalNode does not
# support DISTINCT inside analytic functions (fe/.../analysis/
# AnalyticExpr.java rejects it); neither does Spark's window aggregate —
# but collect_set over the same running ROWS frame is semantically
# count(DISTINCT) and stays JVM-side. DuckDB executes the literal
# count(DISTINCT ...) OVER form, so the oracle exercises the real SQL
# surface while the Spark plan proves the set-based rewrite. Scale: one
# hash-partition shuffle on o_custkey + in-partition sort — the running
# set is bounded by the distinct-priority cardinality (5), so state per
# row is O(5), not O(rows).
@query(
    "window_count_distinct",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(count(DISTINCT o_orderpriority) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_prio_seen
FROM orders
WHERE o_custkey < 300
ORDER BY o_custkey, o_orderkey
""",
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey",
            "o_orderkey",
            F.size(F.collect_set("o_orderpriority").over(w))
            .cast("bigint")
            .alias("n_prio_seen"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Named WINDOW clause (SQL:2003 <window clause>; sql-parser.cup's
# analytic grammar stops at inline OVER, so the named form is dialect
# breadth beyond the reference): one window definition shared by four
# analytic functions — the planner must recognize the shared spec and
# compute ONE Window operator, which also makes this a plan-economy
# statement, not just parser surface. DuckDB supports the identical
# clause, so the oracle is the same text modulo nothing.
_NAMED_WINDOW_SQL = """
SELECT o_orderkey, o_custkey,
       row_number() OVER w AS rn,
       rank() OVER w AS rk,
       CAST(count(*) OVER w AS BIGINT) AS n_seen,
       round(sum(o_totalprice) OVER w * 100) / 100 AS run_total
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_orderkey
"""


@query("window_named_clause", oracle=_NAMED_WINDOW_SQL)
def window_named_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minimised_impala_spark.tables import register_tables

    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_NAMED_WINDOW_SQL)
