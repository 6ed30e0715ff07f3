"""Round-9 property tests: the derived partsupp relation and the real
q2/q11 ports built on it.

The partsupp table is constructed in-query (the fixture ships none) via
the dbgen supplier-assignment formula — these tests pin the structural
invariants both TPC-H ports rely on, at two fixture scales, so a future
fixture change (e.g. a supplier count not divisible by 4) cannot
silently break the distinctness the min-cost/threshold logic assumes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minimised_impala_spark.queries import load_all
from minimised_impala_spark.queries.registry import QUERIES
from minimised_impala_spark.queries.tpch import _partsupp

load_all()

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_partsupp_four_distinct_suppliers_per_part(spark):
    """Every part gets exactly 4 DISTINCT suppliers, each a valid key in
    [1, S] — the dbgen formula's offsets must stay distinct mod S (a
    collision would silently merge min-cost candidates in q2)."""
    for sf_dir in SCALES:
        ps = _partsupp(spark, sf_dir)
        s_cnt = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
        per_part = ps.groupBy("ps_partkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ps_suppkey").alias("nd"),
            F.min("ps_suppkey").alias("lo"),
            F.max("ps_suppkey").alias("hi"),
        )
        bad = per_part.filter(
            (F.col("n") != 4)
            | (F.col("nd") != 4)
            | (F.col("lo") < 1)
            | (F.col("hi") > s_cnt)
        ).count()
        assert bad == 0, f"{sf_dir}: {bad} parts with invalid supplier sets"


def test_partsupp_deterministic_across_builds(spark):
    """Two independent builds produce the identical relation (no
    Date.now/random seam) — the cross-engine compare depends on it."""
    a = _partsupp(spark, SCALES[1]).collect()
    b = _partsupp(spark, SCALES[1]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_partsupp_costs_positive_integer_cents(spark):
    """supplycost stays integer cents in [100, 100099] and availqty in
    [1, 9999] — the bounds the exact-integer threshold math in q11
    documents."""
    ps = _partsupp(spark, SCALES[1])
    row = ps.agg(
        F.min("ps_supplycost_c").alias("c_lo"),
        F.max("ps_supplycost_c").alias("c_hi"),
        F.min("ps_availqty").alias("q_lo"),
        F.max("ps_availqty").alias("q_hi"),
    ).collect()[0]
    assert row["c_lo"] >= 100 and row["c_hi"] <= 100099
    assert row["q_lo"] >= 1 and row["q_hi"] <= 9999


def test_q11_threshold_matches_brute_force(spark):
    """q11's above-nation-average gate replayed in driver-side Python
    from the raw partsupp rows (exact integers end-to-end)."""
    sf_dir = SCALES[1]
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    supp = {
        r["s_suppkey"]: nation[r["s_nationkey"]]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    vals: dict[int, int] = {}
    for r in _partsupp(spark, sf_dir).collect():
        if supp.get(r["ps_suppkey"]) == "NATION_3":
            vals[r["ps_partkey"]] = (
                vals.get(r["ps_partkey"], 0)
                + r["ps_supplycost_c"] * r["ps_availqty"]
            )
    total = sum(vals.values())
    n_parts = len(vals)
    want = {
        pk: v / 100.0 for pk, v in vals.items() if v * n_parts > total
    }
    got = {
        r["ps_partkey"]: r["value"]
        for r in QUERIES["tpch_q11"](spark, sf_dir).collect()
    }
    assert got == want


def test_supplier_assignment_injective_for_any_s():
    """Pure-math property of the partsupp formula (no Spark): for ANY
    supplier count S >= 4 and ANY part key, the four assigned suppliers
    are distinct and in [1, S]. This is exactly the property dbgen's
    folded form loses at small S (S=10, partkey=33 → step 5 → offsets
    {0,5,0,5}), which the fixture's sf0.001 scale exposed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(
        s=st.integers(min_value=4, max_value=100_000),
        pk=st.integers(min_value=1, max_value=10**12),
    )
    def check(s: int, pk: int) -> None:
        supps = {(pk + (pk - 1) // s + j * (s // 4)) % s + 1 for j in range(4)}
        assert len(supps) == 4
        assert all(1 <= x <= s for x in supps)

    check()


def test_nested_topn_outer_rows_preserved(spark):
    """nested_tpch_order_topn: customers whose collection filters to
    empty emit exactly one all-NULL row; no customer emits more than 2
    order rows."""
    sf_dir = SCALES[1]
    rows = QUERIES["nested_tpch_order_topn"](spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["c_custkey"], []).append(r["o_orderkey"])
    assert len(by_cust) == n_cust  # OUTER: every customer appears
    for c, orders in by_cust.items():
        if orders == [None]:
            continue
        assert 1 <= len(orders) <= 2, (c, orders)
        assert None not in orders, (c, orders)


def test_isum_exact_under_any_partitioning(spark):
    """isum (tpch.py): the exact integer-scaled sum must be BIT-IDENTICAL
    to the true rational sum regardless of partition count / add order —
    the guarantee the k=6 sum_charge relies on after the r9 fix (the
    round-after-FP-sum form was one scaled-ulp plan-dependent at sf0.01,
    caught by tests/test_nested_tpch_parity.py)."""
    from fractions import Fraction

    from minimised_impala_spark.queries.tpch import isum

    # 6-decimal rationals shaped like q1's charge terms (price*(1-d)*(1+t)):
    # adversarial magnitudes — large values, tiny values, sign-mixed noise.
    vals = [
        round(((i * 9973) % 120000) + (i % 997) / 1e2 + (i % 101) / 1e6, 6)
        for i in range(1, 20_001)
    ]
    exact = Fraction(0)
    for v in vals:
        exact += Fraction(f"{v:.6f}")
    want = float(exact)

    df0 = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = set()
    for parts in (1, 3, 8, 64):
        df = df0.repartition(parts)
        got.add(df.agg(isum(F.col("x"), 6).alias("s")).collect()[0]["s"])
    assert got == {want}, f"isum drifted across partitionings: {got} vs {want}"
