"""Subquery suite — the reference's StmtRewriter surface.

The reference unnests every subquery at analysis time into joins
(fe/src/main/java/com/cloudera/impala/analysis/StmtRewriter.java:38-332):
[NOT] IN / [NOT] EXISTS become SEMI / ANTI / NULL_AWARE_LEFT_ANTI joins
(common/thrift/PlanNodes.thrift:217-228) and scalar subqueries become
cross/inner joins on the aggregated value. In this engine the same rewrite
is Catalyst's RewritePredicateSubquery + scalar-subquery decorrelation, so
these queries are written as SQL — the declarative form IS the engine API —
and the test asserts the unnested plans produce oracle-identical results.

Reference test corpus: fe/src/test/.../analysis/AnalyzeSubqueriesTest.java,
testdata/workloads/functional-planner/queries/PlannerTest/subquery-rewrite.test.

Scale notes: Catalyst turns each of these into a semi/anti hash join with
the subquery side as build; at 100 TB that is a shuffle-partitioned join
with runtime bloom filters (session.ENGINE_CONF), never a per-row
re-execution of the subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import register_tables


# --------------------------------------------------------------------------
# Uncorrelated scalar subquery: global-average threshold. Deterministic avg
# via the scaled-sum shim (see queries/tpch.py module doc).
# r9 de-vacuousing: the old 2x-average threshold exceeded the fixture's
# o_totalprice maximum, so the query was green on an EMPTY result at
# every scale (both engines agreeing on zero rows tests nothing). 1.5x
# keeps the scalar-subquery shape and yields 380+ rows at sf0.001.
_SCALAR_UNCORR = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT round(sum(o_totalprice) * 100) / 100
                                   / count(*)
                            FROM orders)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("subq_scalar_uncorrelated", oracle=_SCALAR_UNCORR)
def subq_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_UNCORR)


# --------------------------------------------------------------------------
# Correlated scalar aggregate subquery (decorrelated to an agg + join):
# each customer's orders that beat twice their own average order price.
_SCALAR_CORR = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT round(sum(o2.o_totalprice) * 100) / 100
                                 / count(*)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_custkey, o_orderkey
LIMIT 500
"""


@query("subq_scalar_correlated", oracle=_SCALAR_CORR)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_CORR)


# --------------------------------------------------------------------------
# Correlated EXISTS → LEFT SEMI JOIN (StmtRewriter.java:196).
_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                AND o.o_totalprice > 300000)
ORDER BY c_custkey
"""


@query("subq_exists_correlated", oracle=_EXISTS)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_EXISTS)


# --------------------------------------------------------------------------
# Correlated NOT EXISTS → LEFT ANTI JOIN.
# r9 de-vacuousing: every supplier ships after 1998-01-01 at every
# fixture scale (shipdates run to 2001-11), so the old predicate
# anti-joined to an EMPTY result everywhere. The tightened inner
# (late-2001 ship of a near-max quantity) leaves 1/10, 26/100 and
# 207/1000 suppliers surviving — a real anti-join frontier.
_NOT_EXISTS = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey
                    AND l.l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
                    AND l.l_quantity >= 49)
ORDER BY s_suppkey
"""


@query("subq_not_exists_correlated", oracle=_NOT_EXISTS)
def subq_not_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_NOT_EXISTS)


# --------------------------------------------------------------------------
# Uncorrelated IN with an aggregating subquery → LEFT SEMI JOIN over a
# grouped build side (the reference plans IN-subqueries the same way,
# tpch-q18 "large volume customer" pattern).
# r9 de-vacuousing: the fixture's per-part quantity sums top out at
# ~1350 (≈30 lines/part × avg qty 25 at every scale), so HAVING > 1500
# selected nothing anywhere. 900 sits inside the distribution's tail
# (31 parts at sf0.001, 373 at sf0.01, 3917 at sf0.1).
_IN = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                    GROUP BY l_partkey HAVING sum(l_quantity) > 900)
ORDER BY p_partkey
"""


@query("subq_in_aggregated", oracle=_IN)
def subq_in_aggregated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(_IN)


# --------------------------------------------------------------------------
# NOT IN three-valued-logic torture: the reference dedicates a join operator
# to this (NULL_AWARE_LEFT_ANTI_JOIN, PlanNodes.thrift:221-228; planner
# fe/.../planner/SingleNodePlanner.java). One row per semantic case:
#   n_clean  — NOT IN over a NULL-free list: normal anti-join count;
#   n_poison — the list contains a NULL, so NOT IN is never TRUE → 0;
#   n_probe_null — NULL probe keys are never returned by NOT IN.
_NOT_IN_NULL = """
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                           WHERE o_totalprice > 100000)) AS n_clean,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM orders)) AS n_poison,
  (SELECT count(*) FROM customer
   WHERE nullif(c_custkey, 1) NOT IN
         (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
     AND c_custkey = 1) AS n_probe_null
"""


@query("subq_not_in_null_semantics", oracle=_NOT_IN_NULL)
def subq_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_NOT_IN_NULL)


# --------------------------------------------------------------------------
# IN inside a disjunction is NOT unnestable to a plain semi join — the
# reference rejects it (AnalyzeSubqueriesTest.java); Catalyst executes it
# as an ExistenceJoin. Included to pin the semantics the reference lacked.
_IN_DISJUNCT = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal < -900
   OR c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


@query("subq_in_disjunction", oracle=_IN_DISJUNCT)
def subq_in_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_IN_DISJUNCT)
