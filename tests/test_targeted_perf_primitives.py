"""Named coverage for the reference's targeted-perf / perf-regression
workloads (testdata/workloads/targeted-perf/queries/primitive_*.test,
perf-regression/queries/IMPALA-2897.test).

Each reference primitive isolates one physical-plan behavior; here each
gets the fixture-schema equivalent with BOTH a plan-shape pin (the
behavior the primitive targets) and a small correctness check. The
perf-regression case pins that the null-key right-outer-join shape that
was quadratic in the reference's hash table CANNOT degrade here: Spark
equi-joins drop null keys outright, so all-null build keys cost O(n).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minimised_impala_spark.tables import load_table


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# primitive_broadcast_join_1..3 / primitive_exchange_broadcast: small dim
# broadcast automatically; an explicitly hinted LARGE broadcast still
# builds and answers.
def test_primitive_broadcast_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    j = (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j.collect()
    plan = _physical(j)
    assert "BroadcastHashJoin" in plan
    # exchange_broadcast: hinted broadcast of the FACT with an empty probe
    xb = (
        F.broadcast(li)
        .join(nation.filter(F.col("n_regionkey") < 0), F.col("l_orderkey") == F.col("n_nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert xb.collect()[0]["n"] == 0
    assert "BroadcastHashJoin" in _physical(xb)


def test_primitive_exchange_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.hint("shuffle_hash").join(
        orders.hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey")
    ).agg(F.count(F.lit(1)).alias("n"))
    n = j.collect()[0]["n"]
    assert n == li.count()  # every line has its order
    plan = _physical(j)
    assert "Exchange hashpartitioning" in plan
    assert "BroadcastHashJoin" not in plan


# primitive_filter_{bigint,decimal,string}_{selective,non_selective} +
# primitive_filter_string_like: every filter type reaches the scan.
def test_primitive_filters_push_to_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cases = [
        ("bigint_selective", F.col("l_orderkey") == 1),
        ("bigint_non_selective", F.col("l_orderkey") > 0),
        ("decimal_selective", F.col("l_extendedprice") < 1000.0),
        ("decimal_non_selective", F.col("l_extendedprice") > 0.0),
        ("string_selective", F.col("l_returnflag") == "R"),
        ("string_non_selective", F.col("l_returnflag") != ""),
        ("string_like", F.col("l_returnflag").like("R%")),
    ]
    for name, cond in cases:
        df = li.filter(cond).select("l_orderkey")
        plan = _physical(df)
        assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, (
            name,
            plan[plan.find("PushedFilters"):][:120],
        )


# primitive_groupby_{bigint,decimal}_{highndv,lowndv,pk}: hash aggregate
# with a partial (map-side) phase at every cardinality.
def test_primitive_groupby_hash_agg_phases(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    for name, key in [
        ("bigint_highndv", F.col("l_orderkey")),
        ("bigint_lowndv", F.col("l_linenumber")),
        ("decimal_lowndv", F.col("l_discount")),
        ("bigint_pk", F.col("l_orderkey") * 100 + F.col("l_linenumber")),
    ]:
        df = li.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("n"))
        plan = _physical(df)
        assert plan.count("HashAggregate") >= 2, (name, plan[:400])


# primitive_orderby_{all,bigint}: global sort = range-partitioned exchange;
# primitive_top-n_{all,bigint}: ORDER BY + LIMIT = TakeOrderedAndProject.
def test_primitive_orderby_and_topn(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = li.orderBy("l_extendedprice", "l_orderkey")
    assert "rangepartitioning" in _physical(s)
    t = li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber").limit(10)
    assert "TakeOrderedAndProject" in _physical(t)
    assert len(t.collect()) == 10


# primitive_shuffle_join_one_to_many_string_with_groupby /
# primitive_shuffle_join_union_all_with_groupby: fan-out joins + union-all
# feeding one aggregation, exact counts.
def test_primitive_shuffle_join_union_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    one_to_many = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sum(r["n"] for r in one_to_many.collect()) == li.count()
    u = (
        li.select(F.col("l_orderkey").alias("k"))
        .unionAll(orders.select(F.col("o_orderkey").alias("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert u.agg(F.sum("n")).collect()[0][0] == li.count() + orders.count()


# perf-regression IMPALA-2897: right outer join where EVERY build-side key
# is NULL. The reference's hash table had to treat equivalent null keys as
# one bucket to avoid quadratic probing; Spark's equi-join drops null keys
# from matching entirely, so the shape is linear by construction — pin the
# semantics (all right rows null-padded) and that it completes.
def test_impala_2897_null_key_right_outer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select((F.col("o_orderkey") + None).cast("bigint").alias("x"))
    d = orders.select((F.col("o_orderkey") + None).cast("bigint").alias("y"))
    j = c.join(d, F.col("x") == F.col("y"), "right_outer").select(
        (F.col("x").isNull() & F.col("y").isNull()).alias("both_null")
    )
    rows = j.collect()
    assert len(rows) == orders.count()  # no fan-out: null keys never match
    assert all(r["both_null"] for r in rows)
