"""Nested-types operator coverage — the reference reads Parquet collections
and queries them via collection table refs + unnesting (SURVEY §2.9:
SubplanNode be/src/exec/subplan-node.h:30, UnnestNode
be/src/exec/unnest-node.h:50, IsNotEmptyPredicate). In Spark this is
explode()/explode_outer() + array functions — Catalyst fuses the subplan.

The driver fixture has no nested parquet, so arrays are constructed in-query
(split on text, collect_list over joins) — which additionally exercises the
array-construction path. Oracles use DuckDB list functions or an equivalent
relational formulation.

Scale notes: explode multiplies row count — at 100 TB keep the projection
narrow before exploding (only the array column + keys), which these queries
do; collect_list per group is bounded by group size (orders per customer).

tpch_nested workload coverage: 6 shapes are registered oracle-gated rows
here (q18 / pricing / double_unnest / q20 / order_topn / q21); the other
19 of the reference's 22 tpch_nested query files are ported in nested form
and cross-checked row-identical against their flat oracle-verified ports
in tests/test_nested_tpch_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import load_table


# --------------------------------------------------------------------------
# UnnestNode ↔ explode: token frequencies over exploded text arrays.
@query(
    "nested_explode_tokens",
    oracle="""
SELECT tok, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
WHERE tok <> ''
GROUP BY tok
HAVING count(*) >= 50
ORDER BY n DESC, tok
""",
)
def nested_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
        .orderBy(F.desc("n"), "tok")
    )


# --------------------------------------------------------------------------
# Array functions over constructed arrays (reference exposes collections
# only through unnesting; size/contains/sort are the Spark-native extension).
@query(
    "nested_array_funcs",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' '))                    AS n_tokens,
       list_contains(string_split(text, ' '), 'spark') AS has_spark,
       array_to_string((list_sort(string_split(text, ' ')))[1:3], ',')
                                                       AS first3_sorted,
       (string_split(text, ' '))[2]                    AS second_tok
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def nested_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        docs.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.array_contains(toks, "spark").alias("has_spark"),
            # CSV-joined: list-valued cells crash the driver canonicalizer
            # (pandas "unhashable type: 'list'", r3) — scalar output only.
            F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3_sorted"),
            F.element_at(toks, 2).alias("second_tok"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# SubplanNode round-trip: build ARRAY<STRUCT> per customer (collect_list of
# struct), then unnest it back and aggregate — the oracle states the
# equivalent relational semantics directly. Exercises struct construction,
# field access through exploded structs, and IsNotEmptyPredicate
# (size(...) > 0 ↔ the reference's !empty() guard).
@query(
    "nested_struct_roundtrip",
    oracle="""
SELECT c_custkey, count(*) AS n_orders,
       round(sum(o_totalprice) * 100) / 100 AS spend
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nested = (
        cust.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey")
        .agg(
            F.collect_list(
                F.struct(F.col("o_orderkey"), F.col("o_totalprice"))
            ).alias("c_orders")
        )
    )
    return (
        nested.filter(F.size("c_orders") > 0)  # IsNotEmptyPredicate parity
        .select("c_custkey", F.explode("c_orders").alias("o"))
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.round(F.sum("o.o_totalprice") * 100, 0) / 100).alias("spend"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# explode_outer (outer unnest — reference UnnestNode inside a LEFT OUTER
# subplan): customers keep a row even when their filtered order array is
# empty.
@query(
    "nested_explode_outer",
    oracle="""
SELECT c_custkey, o_orderkey
FROM customer
LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                 WHERE o_totalprice > 300000) big
  ON big.o_custkey = c_custkey
WHERE c_custkey < 200
ORDER BY c_custkey, o_orderkey
""",
)
def nested_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nested = (
        cust.filter(F.col("c_custkey") < 200)
        .join(
            orders.filter(F.col("o_totalprice") > 300000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(
            F.collect_list("o_orderkey").alias("big_orders")  # [] when none
        )
    )
    return (
        nested.select(
            "c_custkey", F.explode_outer("big_orders").alias("o_orderkey")
        ).orderBy("c_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Map type coverage (reference MAP type, fe/.../catalog/MapType.java):
# construct map from entries, read back keys/values.
@query(
    "nested_map_access",
    oracle="""
SELECT n_name,
       CAST(map_extract(map {'region': n_regionkey, 'nation': n_nationkey},
                        'nation')[1] AS INT) AS nation_val,
       CAST(map_extract(map {'region': n_regionkey, 'nation': n_nationkey},
                        'region')[1] AS INT) AS region_val
FROM nation
ORDER BY n_name
""",
)
def nested_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("region"), F.col("n_regionkey"), F.lit("nation"), F.col("n_nationkey")
    )
    return nation.select(
        "n_name",
        F.element_at(m, "nation").cast("int").alias("nation_val"),
        F.element_at(m, "region").cast("int").alias("region_val"),
    ).orderBy("n_name")


# --------------------------------------------------------------------------
# Nested TPC-H (the reference's tpch_nested workload,
# testdata/workloads/tpch_nested/queries/: TPC-H rewritten over nested
# customer/orders/lineitems). The nested table is built in-query
# (collect_list of structs per order — the write side of nested parquet),
# then unnested back through explode (UnnestNode/SubplanNode,
# be/src/exec/unnest-node.h:50) into the Q1-style pricing aggregate —
# round-tripping construction AND consumption of nested data.
_NESTED_TPCH_ORACLE = """
WITH nested AS (
  SELECT l_orderkey,
         list(struct_pack(qty := l_quantity, price := l_extendedprice,
                          disc := l_discount, rf := l_returnflag)
              ORDER BY l_linenumber) AS items
  FROM lineitem
  GROUP BY l_orderkey
),
flat AS (
  SELECT unnest(items, recursive := true) FROM nested
)
SELECT rf AS l_returnflag,
       count(*) AS n_items,
       sum(qty) AS sum_qty,
       CAST(sum(CAST(round(price * (1 - disc) * 10000) AS DECIMAL(38,0)))
            AS DOUBLE) / 10000 AS sum_disc_price
FROM flat
GROUP BY rf
ORDER BY rf
"""


# --------------------------------------------------------------------------
# Nested TPC-H Q18 shape (tpch_nested/queries/tpch-q18.test): a correlated
# scalar aggregate over each row's collection —
#   `where (select sum(l_quantity) from o.o_lineitems) > N`
# — is the SubplanNode+UnnestNode pattern (be/src/exec/subplan-node.h:30).
# In Spark the per-row collection aggregate is F.aggregate over the array
# (no re-explode, no join): the subplan is fused into a single projection.
# The `size(items) > 0` guard is IsNotEmptyPredicate
# (be/src/exprs/is-not-empty-predicate.cc). Array-order note: qty is
# integer-valued, so the fold's FP sum is exact in any collect_list order.
_NESTED_Q18_ORACLE = """
WITH nested AS (
  SELECT l_orderkey, list(l_quantity) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
       o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
       o.o_totalprice AS o_totalprice,
       list_sum(n.qtys) AS sum_qty
FROM nested n
JOIN orders o   ON n.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE len(n.qtys) > 0 AND list_sum(n.qtys) > 150
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@query("nested_tpch_q18", oracle=_NESTED_Q18_ORACLE)
def nested_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nested = li.groupBy("l_orderkey").agg(F.collect_list("l_quantity").alias("qtys"))
    qty_sum = F.aggregate("qtys", F.lit(0.0), lambda acc, q: acc + q)
    return (
        nested.filter((F.size("qtys") > 0) & (qty_sum > 150))
        .withColumn("sum_qty", qty_sum)
        .join(orders, nested.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query("nested_tpch_pricing", oracle=_NESTED_TPCH_ORACLE)
def nested_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").alias("qty"),
                F.col("l_extendedprice").alias("price"),
                F.col("l_discount").alias("disc"),
                F.col("l_returnflag").alias("rf"),
            )
        ).alias("items")
    )
    flat = nested.select(F.explode("items").alias("it")).select("it.*")
    s = 10000.0
    # isum discipline (see tpch.py): only THREE groups here, so at sf1+
    # the scaled group sums outgrow dsum's round-after-FP-sum margin
    # (caught by the r10 full-registry sf1 oracle sweep) — accumulate the
    # exact 4-decimal numerators as DECIMAL(38,0) instead.
    disc_price = F.sum(
        F.round(F.col("price") * (1 - F.col("disc")) * s, 0).cast("decimal(38,0)")
    ).cast("double") / s
    return (
        flat.groupBy(F.col("rf").alias("l_returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("qty").alias("sum_qty"),
            disc_price.alias("sum_disc_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Collection EXISTS predicate: keep rows where SOME element of the nested
# collection satisfies a predicate — the reference plans this as a
# SubplanNode whose inner SELECT has conjuncts (tpch_nested pattern
# `WHERE EXISTS (SELECT 1 FROM c.c_orders o WHERE o.o_totalprice > X)`).
# In Spark it is the higher-order `exists(arr, pred)` — a pure projection,
# no re-explode, no join. Counting survivors per segment proves semantics.
_NESTED_EXISTS_ORACLE = """
WITH nested AS (
  SELECT c.c_custkey, c.c_mktsegment,
         list(o.o_totalprice) AS prices
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
)
SELECT c_mktsegment,
       count(*) AS n_custs,
       CAST(sum(CASE WHEN len(list_filter(prices, p -> p > 400000)) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_with_big_order
FROM nested
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("nested_exists_predicate", oracle=_NESTED_EXISTS_ORACLE)
def nested_exists_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nested = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.collect_list("o_totalprice").alias("prices"))
    )
    has_big = F.exists("prices", lambda p: p > 400000)
    return (
        nested.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.when(has_big, 1).otherwise(0)).alias("n_with_big_order"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Doubly-nested navigation — the reference's tpch_nested workload stores
# customer.c_orders.o_lineitems (array<struct> inside array<struct>) and
# every query navigates two CollectionTableRef levels, i.e. a chain of
# SubplanNodes (fe/.../planner/SingleNodePlanner.java collection refs;
# testdata/workloads/tpch_nested/queries/tpch-q1.test FROM
# customer.c_orders.o_lineitems). Here the doubly-nested shape is BUILT
# (two collect_list passes), then NAVIGATED back with a two-level explode,
# and the revenue aggregate must equal the flat 3-way join the oracle
# states. Proves construction, schema, and 2-deep unnesting round-trip.
_NESTED_DOUBLE_ORACLE = """
SELECT c.c_mktsegment AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0
         AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("nested_tpch_double_unnest", oracle=_NESTED_DOUBLE_ORACLE)
def nested_tpch_double_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # build: lineitems nested into orders, orders nested into customers
    o_items = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_extendedprice", "l_discount", "l_quantity")
        ).alias("o_lineitems")
    )
    c_orders = (
        orders.join(o_items, orders.o_orderkey == o_items.l_orderkey, "left")
        .groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct("o_orderkey", "o_totalprice", "o_lineitems")
            ).alias("c_orders")
        )
    )
    nested_cust = cust.join(
        c_orders, cust.c_custkey == c_orders.o_custkey, "left"
    ).select("c_custkey", "c_mktsegment", "c_orders")
    # navigate: two-level unnest (SubplanNode chain), then aggregate
    rev = F.col("item.l_extendedprice") * (1 - F.col("item.l_discount"))
    return (
        nested_cust.select(
            "c_mktsegment", F.explode("c_orders").alias("o")
        )
        .select("c_mktsegment", F.explode("o.o_lineitems").alias("item"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # per-item scaled-int sum: each item's revenue is 4-decimal
            # fixed point, so round(x*1e4) is the same BIGINT in both
            # engines and the integer sum is exact — rounding AFTER a
            # double sum (the old form) broke the strict hash at sf0.1,
            # where the ~1e10 total's accumulation-order error crosses
            # the rounding quantum
            (
                F.sum(F.round(rev * 10000, 0).cast("bigint")).cast("double")
                / 10000.0
            ).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Map higher-order functions — map_filter, transform_values, map_keys /
# map_values, aggregate-over-values, element_at on a missing key.
# nested_map_access covers construction + lookup (reference MapType,
# fe/.../catalog/MapType.java); this query covers the lambda surface the
# reference never had but any Spark user of map columns relies on. The
# map domain is scaled-integer cents (base charge, 8x fee, 4x fee as
# exact BIGINTs) so filter thresholds, doubling, and the value-sum are
# order-independent integer math — no float addition-order hazards
# inside map_values. DuckDB mirrors each entry with straight-line CASE
# logic (its map lambda surface differs), making this a true
# differential test of the HOF rewrites. Scale: pure per-row projection,
# no shuffle.
@query(
    "nested_map_funcs",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS base_e2
  FROM orders WHERE o_orderkey < 500
), k AS (
  SELECT o_orderkey,
         base_e2        >= 20000000 AS keep_base,
         base_e2 * 4    >= 20000000 AS keep_disc,
         base_e2 * 8    >= 20000000 AS keep_fee,
         base_e2
  FROM t
)
SELECT o_orderkey,
       concat_ws(',',
                 CASE WHEN keep_base THEN 'base' END,
                 CASE WHEN keep_disc THEN 'disc' END,
                 CASE WHEN keep_fee  THEN 'fee'  END) AS kept_keys,
       CAST(CAST(keep_base AS INT) + CAST(keep_disc AS INT)
            + CAST(keep_fee AS INT) AS INT) AS n_kept,
       CAST(CASE WHEN keep_base THEN base_e2 * 2 ELSE 0 END
            + CASE WHEN keep_disc THEN base_e2 * 4 * 2 ELSE 0 END
            + CASE WHEN keep_fee  THEN base_e2 * 8 * 2 ELSE 0 END
            AS BIGINT) AS doubled_total_e2,
       CAST(CASE WHEN keep_fee THEN base_e2 * 8 * 2 END AS BIGINT)
         AS fee_doubled_e2
FROM k
ORDER BY o_orderkey
""",
)
def nested_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = F.round(F.col("o_totalprice") * 100).cast("bigint")
    m = F.create_map(
        F.lit("base"), base,
        F.lit("disc"), base * 4,
        F.lit("fee"), base * 8,
    )
    kept = F.map_filter(m, lambda k, v: v >= 20000000)
    doubled = F.transform_values(kept, lambda k, v: v * 2)
    return (
        orders.filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.array_join(F.array_sort(F.map_keys(kept)), ",").alias(
                "kept_keys"
            ),
            F.size(F.map_keys(kept)).alias("n_kept"),
            F.aggregate(
                F.map_values(doubled),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("doubled_total_e2"),
            F.element_at(doubled, F.lit("fee")).alias("fee_doubled_e2"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# HiveQL LATERAL VIEW explode (the syntax every Hive-era migration
# carries; Spark parses it natively — dialect surface the reference's
# users coming FROM Hive expect, complementing the ANSI unnest forms
# above). OUTER variant included so empty arrays keep their parent row.
# The DuckDB oracle re-expresses both with unnest + a LEFT JOIN for the
# OUTER leg.
_LATERAL_VIEW_SQL = """
SELECT doc_id, tok, CAST(pos AS INT) AS pos
FROM documents
LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
WHERE doc_id < 40
ORDER BY doc_id, pos
"""

_LATERAL_VIEW_ORACLE = """
SELECT doc_id,
       unnest(string_split(text, ' ')) AS tok,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT)
         AS pos
FROM documents
WHERE doc_id < 40
ORDER BY doc_id, pos
"""


@query("nested_lateral_view", oracle=_LATERAL_VIEW_ORACLE)
def nested_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minimised_impala_spark.tables import register_tables

    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_LATERAL_VIEW_SQL)


# --------------------------------------------------------------------------
# Nested TPC-H Q20 shape (tpch_nested/queries/tpch-q20.test): "potential
# part promotion" — unnest each supplier's parts collection and keep
# elements whose stocked quantity beats 0.5 × the part's demand from a
# CORRELATED aggregate over a DIFFERENT, doubly-nested collection
# (customer.c_orders.o_lineitems in the reference). This is the
# SubplanNode composition the other nested shapes don't exercise: an
# UnnestNode feeding a join against an aggregate of a second unnest
# chain (be/src/exec/subplan-node.h:30; unnest-node.h:50).
#
# Fixture adaptation (module doc): no partsupp, so the supplier's parts
# collection is built from lineitem (qty shipped in 1997 H2 = the stock
# proxy), and the demand side is the doubly-nested customer → orders →
# lineitems chain flattened back — 'forest%' becomes 'small%'.
#
# Scale: both collections nest via keyed groupBys (map-side combinable);
# the demand aggregate is |parts|-bounded and broadcast back; DISTINCT
# keeps the output |suppliers|-bounded.
_NESTED_Q20_ORACLE = """
WITH supp_parts AS (
  SELECT l_suppkey AS s_key,
         list(struct_pack(partkey := l_partkey, stocked := qty)) AS parts
  FROM (
    SELECT l_suppkey, l_partkey, CAST(sum(l_quantity) AS BIGINT) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
  ) GROUP BY l_suppkey
),
cust_orders AS (
  SELECT o_custkey,
         list(struct_pack(okey := l_orderkey,
                          items := items)) AS orders
  FROM (
    SELECT o_custkey, l_orderkey,
           list(struct_pack(partkey := l_partkey, q := l_quantity)) AS items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY o_custkey, l_orderkey
  ) GROUP BY o_custkey
),
demand AS (
  SELECT it.partkey AS partkey, CAST(sum(it.q) AS BIGINT) AS total_q
  FROM (
    SELECT unnest(o.items) AS it
    FROM (SELECT unnest(orders) AS o FROM cust_orders)
  ) GROUP BY it.partkey
)
SELECT DISTINCT s.s_name, n.n_name
FROM supp_parts sp
JOIN supplier s ON s.s_suppkey = sp.s_key
JOIN nation n   ON n.n_nationkey = s.s_nationkey,
LATERAL unnest(sp.parts) AS u(ps)
JOIN demand d ON d.partkey = ps.partkey
JOIN part p   ON p.p_partkey = ps.partkey
WHERE p.p_name LIKE 'small%'
  AND ps.stocked * 2 > total_q
ORDER BY s_name, n_name
"""


@query("nested_tpch_q20", oracle=_NESTED_Q20_ORACLE)
def nested_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    h2 = F.col("l_shipdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp")
    h1 = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    # supplier → parts collection (stock proxy: qty shipped in H2)
    # r12 optimization (guide §2.4): ONE exchange on the outer nest key
    # feeds both grouping levels — hashpartitioning(l_suppkey) satisfies
    # ClusteredDistribution(l_suppkey, l_partkey) for the inner groupBy
    # AND the outer collect, so the explicit repartition replaces the
    # previous two Exchanges ((suppkey, partkey) then (suppkey)); it
    # also lifts the work off the fixture's one-row-group scan tasks.
    # Same trick on the cust_orders side below ((custkey, orderkey) →
    # custkey). Plan: 7 Exchanges → 5, 3.6 → 1.9 s at sf0.1; results
    # bit-identical.
    supp_parts = (
        li.filter(h2)
        .select("l_suppkey", "l_partkey", "l_quantity")
        .repartition(F.col("l_suppkey"))
        .groupBy(F.col("l_suppkey").alias("s_key"), "l_partkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
        .groupBy("s_key")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_partkey").alias("partkey"),
                    F.col("qty").alias("stocked"),
                )
            ).alias("parts")
        )
    )
    # customer → orders → lineitems, doubly nested then doubly unnested
    cust_orders = (
        orders.join(li.filter(h1), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_orderkey", "l_partkey", "l_quantity")
        .repartition(F.col("o_custkey"))
        .groupBy("o_custkey", "l_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_partkey").alias("partkey"),
                    F.col("l_quantity").alias("q"),
                )
            ).alias("items")
        )
        .groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(F.col("l_orderkey").alias("okey"), F.col("items"))
            ).alias("orders")
        )
    )
    demand = (
        cust_orders.select(F.explode("orders").alias("o"))
        .select(F.explode("o.items").alias("it"))
        .groupBy(F.col("it.partkey").alias("partkey"))
        .agg(F.sum("it.q").cast("bigint").alias("total_q"))
    )
    ps = supp_parts.select("s_key", F.explode("parts").alias("ps")).select(
        "s_key",
        F.col("ps.partkey").alias("ps_partkey"),
        F.col("ps.stocked").alias("stocked"),
    )
    return (
        ps.join(demand, F.col("ps_partkey") == F.col("partkey"))
        .join(
            part.filter(F.col("p_name").like("small%")),
            F.col("p_partkey") == F.col("partkey"),
        )
        .filter(F.col("stocked") * 2 > F.col("total_q"))
        .join(supplier, F.col("s_suppkey") == F.col("s_key"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Per-row ORDER BY ... LIMIT inside a subplan, with OUTER unnest — the
# reference's SelectNode-above-subplan case (be/src/exec/select-node.h:32
# sits above a SubplanNode to apply conjuncts + a LIMIT to each row's
# unnested collection; tpch_nested exercises it as
# `FROM customer c, (SELECT * FROM c.c_orders WHERE ... ORDER BY ...
# LIMIT k) v`). Spark spelling: filter the collection while nesting,
# sort it per row (sort_array over a struct whose FIRST field is the
# negated sort key so ties break ASCENDING on o_orderkey), slice() the
# top-k, explode_outer so customers whose collection filtered to empty
# STILL emit one all-NULL row — the OUTER semantics of the reference's
# UnnestNode. The oracle replays with a LEFT JOIN + row_number.
#
# Scale: one keyed groupBy builds the collection; sort/slice are per-row
# array kernels (no shuffle); the k=2 cap bounds the explode fan-out.
_NESTED_TOPN_ORACLE = """
WITH ranked AS (
  SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey)
           AS rn
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
FROM ranked
WHERE o_orderkey IS NULL OR rn <= 2
ORDER BY c_custkey, o_orderkey
"""


@query("nested_tpch_order_topn", oracle=_NESTED_TOPN_ORACLE)
def nested_tpch_order_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nested = (
        cust.join(
            orders.filter(F.col("o_totalprice") > 400000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("o_orderkey").isNotNull(),
                        F.struct(
                            (-F.col("o_totalprice")).alias("np"),
                            F.col("o_orderkey").alias("okey"),
                            F.col("o_totalprice").alias("price"),
                        ),
                    )
                )
            ).alias("top_orders")
        )
        .withColumn("top_orders", F.slice("top_orders", 1, 2))
    )
    return (
        nested.select(
            "c_custkey",
            "c_mktsegment",
            F.explode_outer("top_orders").alias("o"),
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("o.okey").alias("o_orderkey"),
            F.col("o.price").alias("o_totalprice"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Nested TPC-H Q21 shape (tpch_nested/queries/tpch-q21.test): for each
# late element l1 of an order's lineitems collection, a correlated
# EXISTS over the SAME collection ("another supplier contributed") and
# a correlated NOT EXISTS over it ("no OTHER supplier was late") — the
# reference plans this as a SubplanNode whose inner plan re-reads the
# row's collection twice with different conjuncts. In Spark both
# predicates fuse into higher-order exists() calls whose lambdas
# capture the unnested element — the whole dual-subquery pattern is a
# single projection + filter, ZERO self-joins (contrast tpch_q21,
# which algebraizes the flat form into one per-order aggregate: two
# formulations of the same semantics, cross-checked by their oracles).
#
# Fixture adaptation (as flat q21): late = shipped > 90 days after the
# order date; fixture lacks receipt/commit dates.
#
# Scale: one keyed groupBy builds the collection (bounded by lines per
# order); the HOF filter is a narrow map; the output aggregate is
# |suppliers|-bounded. The oracle deliberately replays the FLAT
# EXISTS/NOT-EXISTS SQL — a structurally different evaluation path.
_NESTED_Q21_ORACLE = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lo l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("nested_tpch_q21", oracle=_NESTED_Q21_ORACLE)
def nested_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    # r12 optimization, two changes with identical results/plan shape:
    # (a) the lineitem exchange moves ABOVE the broadcast join
    # (repartition on l_orderkey; the collect_list groupBy then reuses
    # the partitioning, so the Exchange count is unchanged at 1) — the
    # fixture's one-row-group parquet otherwise pins the whole
    # scan+join+partial-collect stage to a couple of tasks (guide
    # §2.4/§6.1; nested stage 0.60 → 0.50 s at sf0.1); (b) the HOF
    # lambdas and the collect_list(struct(...)) are single F.expr
    # strings — each Python-built lambda costs ~70 ms of py4j round
    # trips at plan-build time (569 round trips → ~100; plan_build
    # 0.65 → 0.10 s, guide §1.2 "driver does no data work" in spirit:
    # the driver also shouldn't do 500 socket hops to describe a plan).
    nested = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(F.col("l_orderkey"))
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "collect_list(struct(l_suppkey AS supp, "
                "l_shipdate > o_orderdate + INTERVAL 90 DAYS AS late)) AS items"
            )
        )
    )
    el = nested.select(
        "items", F.expr("explode(filter(items, x -> x.late)) AS l1")
    )
    dual_subquery = F.expr(
        "exists(items, l2 -> l2.supp != l1.supp) "
        "AND NOT exists(items, l3 -> l3.supp != l1.supp AND l3.late)"
    )
    # Two-level aggregate: per-suppkey partial counts (bounded input to
    # the supplier name join — un-hinted, supplier ∝ SF; AQE picks the
    # strategy), then GROUP BY s_name — the reference/oracle
    # grouping key. Grouping by suppkey alone and carrying the name
    # along diverges whenever two suppliers share a name (caught by the
    # r10 sf1 oracle sweep, where the replicated fixture duplicates
    # names across copies).
    return (
        el.filter(dual_subquery)
        .groupBy(F.col("l1.supp").alias("supp"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(supplier, F.col("s_suppkey") == F.col("supp"))
        .groupBy("s_name")
        .agg(F.sum("cnt").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
