"""Dialect-function parity queries — exercises functions/parity.py.

One oracled query covering the DuckDB-expressible residue functions
(conditionals, strings, bit ops, quotient, decode, interval family,
trunc units) and the tests in tests/test_parity_functions.py cover the
rest (fnv_hash, int_months_between, rotate wrap-around) with Python
goldens — the reference's expr-test.cc pattern (SURVEY §5.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.functions import parity as P
from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import load_table

_ORACLE = """
SELECT o_orderkey,
       nullif(o_orderkey % 3, 0)                            AS nz,
       coalesce(nullif(o_orderkey % 3, 0), 0)               AS zn,
       substring(o_orderpriority, 1, 3)                     AS sl,
       substring(o_orderpriority, -4, 4)                    AS sr,
       ((o_orderkey % 16 + 1) << 3) | ((o_orderkey % 16 + 1) >> 61) AS rl,
       (o_orderkey >> 2) & 1                                AS gb,
       (o_orderkey % 8) | 2                                 AS sb,
       bit_count(o_orderkey)                                AS cs,
       o_orderkey // 7                                      AS q,
       coalesce(o_totalprice > 200000, false)               AS it,
       CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F' THEN 'fin'
            WHEN o_orderstatus IS NOT DISTINCT FROM 'O' THEN 'open'
            ELSE 'oth' END                                  AS dec,
       o_orderdate + INTERVAL 5 HOUR                        AS ha,
       o_orderdate - INTERVAL 90 DAY                        AS ds,
       CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS tq
FROM orders
WHERE o_orderkey < 500
ORDER BY o_orderkey
"""


@query("scalar_parity_fns", oracle=_ORACLE)
def scalar_parity_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        o.filter(k < 500)
        .select(
            k,
            P.nullifzero(k % 3).alias("nz"),
            P.zeroifnull(P.nullifzero(k % 3)).alias("zn"),
            P.strleft(F.col("o_orderpriority"), 3).alias("sl"),
            P.strright(F.col("o_orderpriority"), 4).alias("sr"),
            P.rotateleft(k % 16 + 1, 3).alias("rl"),
            P.getbit(k, 2).cast("bigint").alias("gb"),
            P.setbit(k % 8, 1).alias("sb"),
            P.countset(k).cast("bigint").alias("cs"),
            P.quotient(k, F.lit(7)).alias("q"),
            P.istrue(F.col("o_totalprice") > 200000).alias("it"),
            P.decode(
                F.col("o_orderstatus"),
                F.lit("F"), F.lit("fin"),
                F.lit("O"), F.lit("open"),
                F.lit("oth"),
            ).alias("dec"),
            P.hours_add(F.col("o_orderdate"), 5).alias("ha"),  # type: ignore[attr-defined]
            P.days_sub(F.col("o_orderdate"), 90).alias("ds"),  # type: ignore[attr-defined]
            P.trunc_ts(F.col("o_orderdate"), "Q").alias("tq"),
        )
        .orderBy("o_orderkey")
    )
