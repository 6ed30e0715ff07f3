"""TPC-DS parity: the rest of the reference's tpcds workload.

The reference ships 25 TPC-DS query files + count.test
(testdata/workloads/tpcds/queries/). 16 shapes are registered oracle-gated
rows (queries/tpcds.py); this suite ports the REMAINING 12 files the same
way — plan shape re-expressed over the TPC-H-ish fixture tables with the
same determinism shims (dsum/davg/_wround), DataFrame engine side vs a
DuckDB oracle, compared strictly through tests/oracle.compare (the exact
protocol of the driver's correctness gate, minus the driver itself). Several
of these files are deliberate near-twins in the reference (q42/q52/q55 of
q3; q63/q89 of q53; q34 of q73; q46/q79 of q68) — ported anyway so every
tpcds workload file has a named, verified counterpart; the adaptation per
file is documented on each test.

These are registration candidates for r10, when the rotation budget has
slack (VERDICT r8 #3 caps per-round additions); as tests they carry the
full oracle rigor without consuming driver first-50 slots.

Scale notes: every port keeps the tpcds.py discipline — dims broadcast,
one keyed aggregate on the fact, window layers over |groups| rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.tpch import _rev, davg, dsum
from minimised_impala_spark.tables import load_table
from tests.oracle import compare

load_all()


def _wround(c: F.Column, dec: int = 4) -> F.Column:
    s = float(10**dec)
    return F.round(c * s, 0) / s


def _check(name: str, spark, sf_dir: str, fn, sql: str, min_rows: int = 1):
    r = compare(name, spark, sf_dir, fn, sql)
    assert r["ok"] and r["strict_match"], (name, {k: r[k] for k in r if k != "diff"})
    # zero-row audit: a green compare over an empty result proves nothing
    assert r["spark_rows"] >= min_rows, f"{name}: vacuous ({r['spark_rows']} rows)"


# --------------------------------------------------------------------------
# Q19: brand star agg where the CUSTOMER's geo attribute differs from the
# SELLER's (substr(ca_zip,1,5) <> substr(s_zip,1,5)) — the cross-dim
# inequality is the defining twist. Adapt: customer nation <> supplier
# nation. Reference: tpcds-q19.test.
def test_tpcds_q19_cross_geo(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        part = load_table(spark, sf_dir, "part")
        cust = load_table(spark, sf_dir, "customer")
        supp = load_table(spark, sf_dir, "supplier")
        return (
            li.join(
                orders.filter(
                    (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 11)
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .filter(F.col("c_nationkey") != F.col("s_nationkey"))
            .groupBy(F.col("p_brand").alias("brand"))
            .agg(dsum(_rev(), 4).alias("ext_price"))
            .orderBy(F.desc("ext_price"), "brand")
            .limit(100)
        )

    sql = """
SELECT p.p_brand AS brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
         AS ext_price
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE year(o.o_orderdate) = 1997 AND month(o.o_orderdate) = 11
  AND c.c_nationkey <> s.s_nationkey
GROUP BY p.p_brand
ORDER BY ext_price DESC, brand
LIMIT 100
"""
    _check("tpcds_q19", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q7: star agg emitting FOUR averages per item under demographic + promo-
# channel-disjunction filters. Adapt: c_mktsegment for demographics,
# (priority OR status) for the channel disjunction. Reference: tpcds-q7.test.
def test_tpcds_q7_multi_avg(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        part = load_table(spark, sf_dir, "part")
        cust = load_table(spark, sf_dir, "customer")
        return (
            li.join(
                orders.filter(
                    (F.year("o_orderdate") == 1996)
                    & (
                        (F.col("o_orderpriority") == "5-LOW")
                        | (F.col("o_orderstatus") == "F")
                    )
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(
                cust.filter(F.col("c_mktsegment") == "BUILDING"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .groupBy(F.col("p_brand").alias("item_id"))
            .agg(
                F.avg("l_quantity").alias("agg1"),
                davg(F.col("l_extendedprice"), 2).alias("agg2"),
                davg(F.col("l_discount"), 2).alias("agg3"),
                davg(F.col("l_tax"), 2).alias("agg4"),
            )
            .orderBy("item_id")
            .limit(100)
        )

    sql = """
SELECT p.p_brand AS item_id,
       avg(l.l_quantity) AS agg1,
       round(sum(l.l_extendedprice) * 100) / 100 / count(l.l_extendedprice) AS agg2,
       round(sum(l.l_discount) * 100) / 100 / count(l.l_discount) AS agg3,
       round(sum(l.l_tax) * 100) / 100 / count(l.l_tax) AS agg4
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE year(o.o_orderdate) = 1996
  AND (o.o_orderpriority = '5-LOW' OR o.o_orderstatus = 'F')
  AND c.c_mktsegment = 'BUILDING'
GROUP BY p.p_brand
ORDER BY item_id
LIMIT 100
"""
    _check("tpcds_q7", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q34 (q73's twin, wider band + disjunctive day-of-month filter): lines
# per ticket in a count band, joined back to customer detail.
# Reference: tpcds-q34.test. Fixture orders cap at 12 lines, so the
# 15-20 band maps to 8-12.
def test_tpcds_q34_ticket_band(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        dn = (
            li.join(
                orders.filter(
                    F.dayofmonth("o_orderdate").between(1, 3)
                    | F.dayofmonth("o_orderdate").between(25, 28)
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey", "o_custkey")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt").between(8, 12))
        )
        return (
            dn.join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .select(
                "c_name",
                "c_mktsegment",
                F.col("o_orderkey").alias("ticket"),
                "cnt",
            )
            .orderBy("c_name", "ticket")
            .limit(1000)
        )

    sql = """
WITH dn AS (
  SELECT l.l_orderkey, o.o_custkey, count(*) AS cnt
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE day(o.o_orderdate) BETWEEN 1 AND 3
     OR day(o.o_orderdate) BETWEEN 25 AND 28
  GROUP BY l.l_orderkey, o.o_custkey
)
SELECT c.c_name, c.c_mktsegment, dn.l_orderkey AS ticket, dn.cnt
FROM dn JOIN customer c ON c.c_custkey = dn.o_custkey
WHERE dn.cnt BETWEEN 8 AND 12
ORDER BY c_name, ticket
LIMIT 1000
"""
    _check("tpcds_q34", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q42 (q3's category twin): star agg grouped by category (p_type) for one
# month. Reference: tpcds-q42.test.
def test_tpcds_q42_category_star(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        part = load_table(spark, sf_dir, "part")
        return (
            li.join(
                orders.filter(
                    (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 12)
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(
                F.broadcast(part.filter(F.col("p_size") < 25)),
                F.col("p_partkey") == F.col("l_partkey"),
            )
            .groupBy(
                F.year("o_orderdate").cast("int").alias("d_year"),
                F.col("p_type").alias("category"),
            )
            .agg(dsum(_rev(), 4).alias("sum_agg"))
            .orderBy(F.desc("sum_agg"), "d_year", "category")
            .limit(100)
        )

    sql = """
SELECT CAST(year(o.o_orderdate) AS INT) AS d_year,
       p.p_type AS category,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
         AS sum_agg
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p   ON p.p_partkey = l.l_partkey
WHERE year(o.o_orderdate) = 1997 AND month(o.o_orderdate) = 12
  AND p.p_size < 25
GROUP BY year(o.o_orderdate), p.p_type
ORDER BY sum_agg DESC, d_year, category
LIMIT 100
"""
    _check("tpcds_q42", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q43: full 7-column day-of-week pivot per store (supplier nation here),
# one year. CASE ... ELSE NULL sums stay NULL for empty cells in both
# engines. Reference: tpcds-q43.test.
def test_tpcds_q43_dow_pivot(spark, sf_dir):
    days = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday"]

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        dn = F.date_format("l_shipdate", "EEEE")
        aggs = [
            dsum(F.when(dn == d, _rev()), 4).alias(f"{d[:3].lower()}_sales")
            for d in days
        ]
        return (
            li.filter(F.year("l_shipdate") == 1997)
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
            .groupBy(F.col("n_name").alias("store"))
            .agg(*aggs)
            .orderBy("store")
            .limit(100)
        )

    cells = ",\n".join(
        f"       round(sum(CASE WHEN dayname(l.l_shipdate) = '{d}' "
        f"THEN l.l_extendedprice * (1 - l.l_discount) END) * 10000) / 10000 "
        f"AS {d[:3].lower()}_sales"
        for d in days
    )
    sql = f"""
SELECT n.n_name AS store,
{cells}
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE year(l.l_shipdate) = 1997
GROUP BY n.n_name
ORDER BY store
LIMIT 100
"""
    _check("tpcds_q43", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q46 (q68's twin): per-ticket amt/profit where the bought-at geo differs
# from the customer's home geo, emitted at detail grain.
# Reference: tpcds-q46.test.
def test_tpcds_q46_bought_city(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        cust = load_table(spark, sf_dir, "customer")
        home = nation.select(
            F.col("n_nationkey").alias("h_key"), F.col("n_name").alias("home_nation")
        )
        inner = (
            li.join(
                orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
            .groupBy(
                F.col("o_orderkey").alias("ticket"),
                "o_custkey",
                F.col("n_name").alias("bought_nation"),
            )
            .agg(
                dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("amt"),
                dsum(_rev(), 4).alias("profit"),
            )
        )
        return (
            inner.join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(home), F.col("h_key") == F.col("c_nationkey"))
            .filter(F.col("bought_nation") != F.col("home_nation"))
            .select("c_name", "home_nation", "bought_nation", "ticket", "amt", "profit")
            .orderBy("c_name", "ticket", "bought_nation")
            .limit(100)
        )

    sql = """
WITH inner_q AS (
  SELECT l.l_orderkey AS ticket, o.o_custkey, n.n_name AS bought_nation,
         round(sum(l.l_extendedprice * l.l_discount) * 10000) / 10000 AS amt,
         round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
           AS profit
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY l.l_orderkey, o.o_custkey, n.n_name
)
SELECT c.c_name, hn.n_name AS home_nation, i.bought_nation, i.ticket,
       i.amt, i.profit
FROM inner_q i
JOIN customer c ON c.c_custkey = i.o_custkey
JOIN nation hn  ON hn.n_nationkey = c.c_nationkey
WHERE i.bought_nation <> hn.n_name
ORDER BY c_name, ticket, bought_nation
LIMIT 100
"""
    _check("tpcds_q46", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q52 (q3's brand twin, December): (year, brand) star agg.
# Reference: tpcds-q52.test.
def test_tpcds_q52_brand_star(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        part = load_table(spark, sf_dir, "part")
        return (
            li.join(
                orders.filter(
                    (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") == 12)
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(
                F.broadcast(part.filter(F.col("p_size").between(5, 10))),
                F.col("p_partkey") == F.col("l_partkey"),
            )
            .groupBy(
                F.year("o_orderdate").cast("int").alias("d_year"),
                F.col("p_brand").alias("brand"),
            )
            .agg(dsum(_rev(), 4).alias("ext_price"))
            .orderBy(F.desc("ext_price"), "d_year", "brand")
            .limit(100)
        )

    sql = """
SELECT CAST(year(o.o_orderdate) AS INT) AS d_year,
       p.p_brand AS brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
         AS ext_price
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p   ON p.p_partkey = l.l_partkey
WHERE year(o.o_orderdate) = 1996 AND month(o.o_orderdate) = 12
  AND p.p_size BETWEEN 5 AND 10
GROUP BY year(o.o_orderdate), p.p_brand
ORDER BY ext_price DESC, d_year, brand
LIMIT 100
"""
    _check("tpcds_q52", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q55 (q3's minimal twin: brand only, one month/year, manager filter).
# Reference: tpcds-q55.test.
def test_tpcds_q55_brand_month(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        part = load_table(spark, sf_dir, "part")
        return (
            li.join(
                orders.filter(
                    (F.year("o_orderdate") == 1995) & (F.month("o_orderdate") == 11)
                ),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(
                F.broadcast(part.filter(F.col("p_size") <= 15)),
                F.col("p_partkey") == F.col("l_partkey"),
            )
            .groupBy(F.col("p_brand").alias("brand"))
            .agg(dsum(_rev(), 4).alias("ext_price"))
            .orderBy(F.desc("ext_price"), "brand")
            .limit(100)
        )

    sql = """
SELECT p.p_brand AS brand,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
         AS ext_price
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p   ON p.p_partkey = l.l_partkey
WHERE year(o.o_orderdate) = 1995 AND month(o.o_orderdate) = 11
  AND p.p_size <= 15
GROUP BY p.p_brand
ORDER BY ext_price DESC, brand
LIMIT 100
"""
    _check("tpcds_q55", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q63 (q53's manager twin): monthly brand sums vs the brand's yearly
# average, deviation filter. Same _wround window discipline as the
# registered q53. Reference: tpcds-q63.test.
def test_tpcds_q63_monthly_deviation(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        ms = (
            li.filter(F.year("l_shipdate") == 1997)
            .join(
                F.broadcast(part.filter(F.col("p_size").isin(1, 5, 9, 13))),
                F.col("p_partkey") == F.col("l_partkey"),
            )
            .groupBy(
                F.col("p_brand").alias("brand"),
                F.month("l_shipdate").cast("int").alias("mon"),
            )
            .agg(dsum(_rev(), 4).alias("sum_sales"))
        )
        w = Window.partitionBy("brand")
        win = ms.withColumn(
            "avg_monthly",
            _wround(F.sum("sum_sales").over(w)) / F.count(F.lit(1)).over(w),
        )
        return (
            win.filter(
                F.abs(F.col("sum_sales") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.1
            )
            .select("brand", "mon", "sum_sales", "avg_monthly")
            .orderBy("brand", "mon")
            .limit(100)
        )

    sql = """
WITH ms AS (
  SELECT p.p_brand AS brand, CAST(month(l.l_shipdate) AS INT) AS mon,
         round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
           AS sum_sales
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) = 1997 AND p.p_size IN (1, 5, 9, 13)
  GROUP BY p.p_brand, month(l.l_shipdate)
), win AS (
  SELECT brand, mon, sum_sales,
         round(sum(sum_sales) OVER (PARTITION BY brand) * 10000) / 10000
           / count(*) OVER (PARTITION BY brand) AS avg_monthly
  FROM ms
)
SELECT brand, mon, sum_sales, avg_monthly
FROM win
WHERE abs(sum_sales - avg_monthly) / avg_monthly > 0.1
ORDER BY brand, mon
LIMIT 100
"""
    _check("tpcds_q63", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q89 (q53's class twin): (category, brand, month) sums vs the average
# over the (category, month) slice — deviation across a DIFFERENT
# partitioning than the group key. Reference: tpcds-q89.test.
def test_tpcds_q89_class_deviation(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        ms = (
            li.filter(F.year("l_shipdate") == 1996)
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .groupBy(
                F.col("p_type").alias("category"),
                F.col("p_brand").alias("brand"),
                F.month("l_shipdate").cast("int").alias("mon"),
            )
            .agg(dsum(_rev(), 4).alias("sum_sales"))
        )
        w = Window.partitionBy("category", "mon")
        win = ms.withColumn(
            "avg_slice",
            _wround(F.sum("sum_sales").over(w)) / F.count(F.lit(1)).over(w),
        )
        return (
            win.filter(
                F.abs(F.col("sum_sales") - F.col("avg_slice")) / F.col("avg_slice")
                > 0.2
            )
            .select("category", "brand", "mon", "sum_sales", "avg_slice")
            .orderBy("category", "brand", "mon")
            .limit(500)
        )

    sql = """
WITH ms AS (
  SELECT p.p_type AS category, p.p_brand AS brand,
         CAST(month(l.l_shipdate) AS INT) AS mon,
         round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
           AS sum_sales
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) = 1996
  GROUP BY p.p_type, p.p_brand, month(l.l_shipdate)
), win AS (
  SELECT category, brand, mon, sum_sales,
         round(sum(sum_sales) OVER (PARTITION BY category, mon) * 10000) / 10000
           / count(*) OVER (PARTITION BY category, mon) AS avg_slice
  FROM ms
)
SELECT category, brand, mon, sum_sales, avg_slice
FROM win
WHERE abs(sum_sales - avg_slice) / avg_slice > 0.2
ORDER BY category, brand, mon
LIMIT 500
"""
    _check("tpcds_q89", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q79 (q68's priority twin): per-(customer, ticket) amt/profit under an
# urgency filter and a seller-geo IN-list, detail output.
# Reference: tpcds-q79.test.
def test_tpcds_q79_urgent_detail(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        cust = load_table(spark, sf_dir, "customer")
        return (
            li.join(
                orders.filter(F.col("o_orderpriority") == "1-URGENT"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(
                F.broadcast(
                    nation.filter(F.col("n_name").isin("NATION_3", "NATION_8"))
                ),
                F.col("n_nationkey") == F.col("s_nationkey"),
            )
            .groupBy(
                "o_custkey",
                F.col("o_orderkey").alias("ticket"),
                F.col("n_name").alias("store_nation"),
            )
            .agg(
                dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("amt"),
                dsum(_rev(), 4).alias("profit"),
            )
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .select("c_name", "ticket", "store_nation", "amt", "profit")
            .orderBy("c_name", "ticket", "store_nation")
            .limit(100)
        )

    sql = """
WITH inner_q AS (
  SELECT o.o_custkey, l.l_orderkey AS ticket, n.n_name AS store_nation,
         round(sum(l.l_extendedprice * l.l_discount) * 10000) / 10000 AS amt,
         round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000) / 10000
           AS profit
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE o.o_orderpriority = '1-URGENT'
    AND n.n_name IN ('NATION_3', 'NATION_8')
  GROUP BY o.o_custkey, l.l_orderkey, n.n_name
)
SELECT c.c_name, i.ticket, i.store_nation, i.amt, i.profit
FROM inner_q i JOIN customer c ON c.c_custkey = i.o_custkey
ORDER BY c_name, ticket, store_nation
LIMIT 100
"""
    _check("tpcds_q79", spark, sf_dir, q, sql)


# --------------------------------------------------------------------------
# Q96: a pure filtered COUNT through three broadcast dims (time band,
# demographic band, named store). Adapt: quantity band, acctbal band,
# named nation. Reference: tpcds-q96.test.
def test_tpcds_q96_filtered_count(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer")
        supp = load_table(spark, sf_dir, "supplier")
        nation = load_table(spark, sf_dir, "nation")
        return (
            li.filter(F.col("l_quantity").between(25, 50))
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(
                cust.filter(F.col("c_acctbal").between(0.0, 5000.0)),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(
                F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
                F.col("n_nationkey") == F.col("s_nationkey"),
            )
            .agg(F.count(F.lit(1)).alias("total"))
        )

    sql = """
SELECT CAST(count(*) AS BIGINT) AS total
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE l.l_quantity BETWEEN 25 AND 50
  AND c.c_acctbal BETWEEN 0.0 AND 5000.0
  AND n.n_name = 'NATION_3'
"""

    def q_checked(spark, sf_dir):
        df = q(spark, sf_dir)
        return df

    _check("tpcds_q96", spark, sf_dir, q_checked, sql)
    # count must itself be non-zero, else the single-row compare is weak
    assert q(spark, sf_dir).collect()[0]["total"] > 0


# --------------------------------------------------------------------------
# count.test: the workload's smoke row-count file.
def test_tpcds_count(spark, sf_dir):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem")
        return li.agg(F.count(F.lit(1)).alias("n"))

    _check("tpcds_count", spark, sf_dir, q,
           "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem")
