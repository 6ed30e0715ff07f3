"""UDF / UDA surface tests (SURVEY §2.10). The reference exposes native
C++ UDFs via the FunctionContext ABI (be/src/udf/udf.h:47-293, called
through scalar-fn-call.cc) and UDAs via Init/Update/Merge/Serialize/
Finalize (be/src/udf/uda-test-harness.h:42-71); the engine's equivalents
are Python UDFs, Arrow-vectorized pandas UDFs (the fast path), grouped-agg
pandas UDFs, and applyInPandas/mapInPandas for table-level custom logic."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from minimised_impala_spark.tables import load_table


def test_python_udf_register_and_sql(spark):
    """spark.udf.register ≙ CREATE FUNCTION (fe/.../analysis/CreateUdfStmt.java);
    usable from both the DataFrame API and SQL."""
    spark.udf.register("add_tax", lambda x: x * 1.1 if x is not None else None, "double")
    row = spark.sql(
        "SELECT add_tax(CAST(100.0 AS DOUBLE)) v, add_tax(CAST(NULL AS DOUBLE)) n"
    ).collect()[0]
    assert abs(row["v"] - 110.0) < 1e-9 and row["n"] is None
    fns = [r["function"] for r in spark.sql("SHOW USER FUNCTIONS").collect()]
    assert any("add_tax" in f for f in fns)


def test_pandas_udf_scalar(spark, sf_dir):
    """Arrow-batched scalar UDF — the engine's fast UDF path (≈10-100×
    row-at-a-time Python; SURVEY guidance)."""

    @pandas_udf("double")
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load_table(spark, sf_dir, "lineitem").limit(1000)
    got = li.select(
        discounted("l_extendedprice", "l_discount").alias("u"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("b"),
    ).collect()
    for r in got:
        assert abs(r["u"] - r["b"]) < 1e-9


def test_pandas_udf_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF ≙ UDA Update/Merge/Finalize
    (be/src/exprs/agg-fn-evaluator.h:62)."""

    @pandas_udf("double")
    def price_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    orders = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderstatus"]: r["rng"]
        for r in orders.groupBy("o_orderstatus")
        .agg(price_range("o_totalprice").alias("rng"))
        .collect()
    }
    expect = {
        r["o_orderstatus"]: r["mx"] - r["mn"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.max("o_totalprice").alias("mx"), F.min("o_totalprice").alias("mn"))
        .collect()
    }
    assert got.keys() == expect.keys()
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-6


def test_grouped_agg_udf_over_window(spark, sf_dir):
    """Pandas UDAs also run over windows — parity with 'any aggregate over
    a window' (SURVEY §2.5)."""
    from pyspark.sql import Window as W

    @pandas_udf("double")
    def total(v: pd.Series) -> float:
        return float(v.sum())

    orders = load_table(spark, sf_dir, "orders").limit(500)
    w = W.partitionBy("o_custkey")
    got = orders.select(
        "o_orderkey",
        total("o_totalprice").over(w).alias("u"),
        F.sum("o_totalprice").over(w).alias("b"),
    ).collect()
    for r in got:
        assert abs(r["u"] - r["b"]) < 1e-6


def test_apply_in_pandas_grouped_map(spark, sf_dir):
    """applyInPandas: per-group table transform (no reference analogue —
    richer than its UDF ABI; the engine's custom-operator escape hatch)."""

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(2, "o_totalprice")[["o_custkey", "o_orderkey", "o_totalprice"]]

    orders = load_table(spark, sf_dir, "orders")
    got = (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(top2, "o_custkey BIGINT, o_orderkey BIGINT, o_totalprice DOUBLE")
    )
    counts = got.groupBy("o_custkey").count().collect()
    assert counts and all(r["count"] <= 2 for r in counts)


def test_map_in_pandas(spark, sf_dir):
    """mapInPandas: partition-wise batch transform (Arrow in/out)."""

    def add_flag(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["is_large"] = pdf["o_totalprice"] > 200000
            yield pdf

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    got = orders.mapInPandas(add_flag, "o_orderkey BIGINT, o_totalprice DOUBLE, is_large BOOLEAN")
    n_large = got.filter("is_large").count()
    n_expected = orders.filter("o_totalprice > 200000").count()
    assert n_large == n_expected > 0


def test_udf_null_and_error_semantics(spark):
    """NULL in → NULL out convention and non-ANSI tolerance, matching the
    reference's UDF NULL handling (udf.h *Val null flags)."""
    spark.udf.register("safe_div", lambda a, b: a / b if b else None, "double")
    row = spark.sql(
        "SELECT safe_div(CAST(10.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) a, "
        "       safe_div(CAST(10.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) b"
    ).collect()[0]
    assert row["a"] == 5.0 and row["b"] is None
