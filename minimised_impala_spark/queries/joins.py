"""Join operator coverage — every TJoinOp mode of the reference
(common/thrift/PlanNodes.thrift:214-230): INNER, LEFT/RIGHT OUTER, FULL
OUTER, LEFT/RIGHT SEMI, LEFT/RIGHT ANTI, NULL_AWARE_LEFT_ANTI, CROSS —
plus theta (non-equi) joins (be/src/exec/nested-loop-join-node.h:46) and
null-safe equality (IS NOT DISTINCT FROM, sql-parser.cup:2459).

Spark mapping: df.join(how=...) for the DataFrame-expressible modes;
NOT IN's null-aware anti join goes through spark.sql because Catalyst's
null-aware anti join is only produced by the SQL rewrite
(RewritePredicateSubquery), mirroring how the reference's StmtRewriter
maps [NOT] IN to NULL_AWARE_LEFT_ANTI (fe/.../analysis/StmtRewriter.java:196).

Scale notes: semi/anti joins keep the build side small by aggregating or
filtering before the join; theta-join examples are dimension-sized on
purpose (a theta join over two fact tables is a cartesian hazard at 100 TB
— the reference had the same constraint with its nested-loop join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import load_table, register_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
@query(
    "join_right_outer",
    oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
FROM orders
RIGHT OUTER JOIN customer ON o_custkey = c_custkey AND o_orderstatus = 'F'
GROUP BY c_custkey, c_name
ORDER BY c_custkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        orders.join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderstatus") == "F"),
            "right_outer",
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
@query(
    "join_full_outer",
    oracle="""
SELECT coalesce(a.k, b.k) AS k, a.n_small, b.n_big
FROM (SELECT o_custkey AS k, count(*) AS n_small FROM orders
      WHERE o_totalprice < 20000 GROUP BY o_custkey) a
FULL OUTER JOIN
     (SELECT o_custkey AS k, count(*) AS n_big FROM orders
      WHERE o_totalprice > 150000 GROUP BY o_custkey) b
  ON a.k = b.k
ORDER BY k
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    small = (
        orders.filter(F.col("o_totalprice") < 20000)
        .groupBy(F.col("o_custkey").alias("ak"))
        .agg(F.count(F.lit(1)).alias("n_small"))
    )
    big = (
        orders.filter(F.col("o_totalprice") > 150000)
        .groupBy(F.col("o_custkey").alias("bk"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return (
        small.join(big, F.col("ak") == F.col("bk"), "full_outer")
        .select(
            F.coalesce(F.col("ak"), F.col("bk")).alias("k"),
            "n_small",
            "n_big",
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# RIGHT SEMI: planner form of "probe side on the left"; in Spark we express
# the same semantics by swapping inputs of left_semi.
@query(
    "join_right_semi",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
ORDER BY p_partkey
""",
)
def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li = _t(spark, sf_dir, "part", "lineitem")
    return (
        part.join(
            li.filter(F.col("l_quantity") > 45),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
@query(
    "join_left_anti",
    oracle="""
SELECT p_partkey, p_brand
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                  AND l_returnflag = 'R' AND l_quantity > 48)
ORDER BY p_partkey
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r9 de-vacuousing: with ~30 lines/part, every part had at least one
    # plain 'R' line at every scale, so the anti join kept nothing (the
    # compare was green on empty). The added near-max-quantity conjunct
    # leaves ~2/3 of parts surviving — a real anti-join frontier.
    part, li = _t(spark, sf_dir, "part", "lineitem")
    return (
        part.join(
            li.filter(
                (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 48)
            ),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_anti",
        )
        .select("p_partkey", "p_brand")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# RIGHT ANTI (reference TJoinOp RIGHT_ANTI_JOIN,
# common/thrift/PlanNodes.thrift:214-230): the planner's inverted form of
# an anti join — keep build-side rows with no probe-side match.  Spark has
# no native right_anti join type, so the canonical expression is a
# left_anti with the inputs swapped: suppliers with no max-quantity
# high-value shipment survive, lineitem being the (conceptually left)
# probe.  The predicate keeps ~40% of suppliers at sf0.01 so the driver
# row is a non-trivial survivor set, not an empty relation.
@query(
    "join_right_anti",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey
    AND l_quantity >= 49 AND l_extendedprice > 100000
)
ORDER BY s_suppkey
""",
)
def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, li = _t(spark, sf_dir, "supplier", "lineitem")
    big_ships = li.filter(
        (F.col("l_quantity") >= 49) & (F.col("l_extendedprice") > 100000)
    )
    # right-anti(probe=big_ships, build=supplier) ≡ left_anti with
    # supplier promoted to the left input.
    return (
        supp.join(big_ships, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# NULL_AWARE_LEFT_ANTI (reference PlanNodes.thrift:228): NOT IN over a
# nullable probe expression — rows where the expression is NULL are dropped
# (UNKNOWN), which a plain anti join would wrongly keep.
@query(
    "join_null_aware_anti",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE nullif(o_custkey, 7) NOT IN
      (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
ORDER BY o_orderkey
""",
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE nullif(o_custkey, 7) NOT IN
              (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
@query(
    "join_cross",
    oracle="""
SELECT r_name, count(*) AS n_pairs
FROM region CROSS JOIN nation
GROUP BY r_name
ORDER BY r_name
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation = _t(spark, sf_dir, "region", "nation")
    return (
        region.crossJoin(nation)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Theta join (non-equi conjunct only) → BroadcastNestedLoopJoin in Spark,
# NestedLoopJoinNode in the reference (be/src/exec/nested-loop-join-node.h:46).
@query(
    "join_theta",
    oracle="""
SELECT s1.s_nationkey AS nationkey, count(*) AS n_dominated
FROM supplier s1 JOIN supplier s2
  ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
GROUP BY s1.s_nationkey
ORDER BY s1.s_nationkey
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    (supp,) = _t(spark, sf_dir, "supplier")
    s1 = supp.select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("bal1")
    )
    s2 = supp.select(
        F.col("s_nationkey").alias("nk2"), F.col("s_acctbal").alias("bal2")
    )
    return (
        s1.join(s2, (F.col("nationkey") == F.col("nk2")) & (F.col("bal1") < F.col("bal2")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_dominated"))
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# Null-safe equality join: IS NOT DISTINCT FROM ↔ Column.eqNullSafe
# (reference grammar sql-parser.cup:2459-2463).
@query(
    "join_null_safe_eq",
    oracle="""
SELECT a.g AS g, count(*) AS n
FROM (SELECT nullif(n_regionkey, 2) AS g, n_nationkey FROM nation) a
JOIN (SELECT nullif(r_regionkey, 2) AS g FROM region) b
  ON a.g IS NOT DISTINCT FROM b.g
GROUP BY a.g
ORDER BY g NULLS FIRST
""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, region = _t(spark, sf_dir, "nation", "region")
    a = nation.select(F.nullif(F.col("n_regionkey"), F.lit(2)).alias("ag"))
    b = region.select(F.nullif(F.col("r_regionkey"), F.lit(2)).alias("bg"))
    return (
        a.join(b, F.col("ag").eqNullSafe(F.col("bg")))
        .groupBy(F.col("ag").alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("g"))
    )


# --------------------------------------------------------------------------
_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_custkey < 200
ORDER BY c.c_custkey, t.o_orderkey
"""


@query("join_lateral", oracle=_LATERAL_SQL)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join (top-2 orders per customer) —
    beyond the vendored reference (its grammar, fe/src/main/cup/
    sql-parser.cup, has no LATERAL; later engines and ANSI added it).
    The IDENTICAL SQL text runs on both engines: Catalyst decorrelates
    the per-row subquery into a ranked join (same physical shape as
    window_topk_per_group), so 'run a subquery per outer row' never
    executes literally — the plan is one shuffle + rank at any scale.
    Values pass through unaggregated, so no rounding shims are needed."""
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------------
# Skew-mitigated JOIN as a driver-oracled query (§2 skew row's join half;
# the groupBy half is agg_salted_skew): a deliberately skewed probe key
# (~70% of orders collapse onto nation 0) joined to the nation dim
# through operators.skew.salted_join — probe rows salt uniformly, the
# build side replicates under every salt, so the hot key spreads over
# n_salts shuffle partitions instead of one straggler task. The oracle
# is the plain equi-join: a green hash proves the salting rewrite is
# semantics-preserving. At 100 TB this is the fallback for hot keys on
# broadcast-ineligible build sides (AQE skew-join handles the rest).
@query(
    "join_salted_skew",
    oracle="""
WITH probe AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 < 7 THEN 0
              ELSE o_orderkey % 25 END AS n_nationkey,
         o_totalprice
  FROM orders
)
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(p.o_totalprice) * 100) / 100 AS revenue
FROM probe p JOIN nation n ON n.n_nationkey = p.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minimised_impala_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    probe = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("o_orderkey") % 25)
        .cast("long")
        .alias("n_nationkey"),
        "o_totalprice",
    )
    build = nation.select(F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name")
    joined = salted_join(probe, build, on="n_nationkey", n_salts=8)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            (F.round(F.sum("o_totalprice") * 100) / 100).alias("revenue"),
        )
        .orderBy("n_name")
    )
