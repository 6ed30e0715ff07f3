"""Per-function golden tests for the dialect parity layer — the engine's
analogue of the reference's be/src/exprs/expr-test.cc (5788 LoC of
per-function golden values; SURVEY §5.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minimised_impala_spark.functions import parity as P


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def fnv1a64(data: bytes) -> int:
    h = P.FNV64_OFFSET
    for b in data:
        h = ((h ^ b) * P.FNV64_PRIME) % (1 << 64)
    return h - (1 << 64) if h >= (1 << 63) else h


@pytest.mark.parametrize("s", ["", "a", "hello", "TPC-H", "naïve ünïcode", "0" * 100])
def test_fnv_hash_golden(spark, s):
    assert _one(spark, P.fnv_hash(F.lit(s))) == fnv1a64(s.encode("utf-8"))


def test_fnv_hash_sql_matches_column(spark):
    P.register_sql_functions(spark)
    sql_v = spark.sql("SELECT fnv_hash('spark') v").collect()[0]["v"]
    assert sql_v == fnv1a64(b"spark")


def rot64(x: int, n: int, left: bool) -> int:
    n %= 64
    if not left:
        n = (64 - n) % 64
    v = ((x << n) | (x >> (64 - n))) % (1 << 64) if n else x % (1 << 64)
    return v - (1 << 64) if v >= (1 << 63) else v


@pytest.mark.parametrize("x,n", [(1, 0), (1, 1), (1, 63), (1, 64), (0x0F0F, 8), (-1, 17), (7, 130)])
def test_rotate_golden(spark, x, n):
    assert _one(spark, P.rotateleft(F.lit(x).cast("bigint"), n)) == rot64(x % (1 << 64), n, True)
    assert _one(spark, P.rotateright(F.lit(x).cast("bigint"), n)) == rot64(x % (1 << 64), n, False)


def test_bit_functions(spark):
    assert _one(spark, P.getbit(F.lit(5).cast("bigint"), 0)) == 1
    assert _one(spark, P.getbit(F.lit(5).cast("bigint"), 1)) == 0
    assert _one(spark, P.setbit(F.lit(0).cast("bigint"), 3)) == 8
    assert _one(spark, P.setbit(F.lit(15).cast("bigint"), 0, 0)) == 14
    assert _one(spark, P.setbit(F.lit(8).cast("bigint"), 3, 1)) == 8
    assert _one(spark, P.countset(F.lit(255).cast("bigint"))) == 8
    assert _one(spark, P.countset(F.lit(255).cast("bigint"), 0)) == 56
    assert _one(spark, P.countset(F.lit(-1).cast("bigint"))) == 64


def test_conditionals(spark):
    assert _one(spark, P.nullifzero(F.lit(0))) is None
    assert _one(spark, P.nullifzero(F.lit(7))) == 7
    assert _one(spark, P.zeroifnull(F.lit(None).cast("int"))) == 0
    null_b = F.lit(None).cast("boolean")
    assert _one(spark, P.istrue(null_b)) is False
    assert _one(spark, P.isfalse(null_b)) is False
    assert _one(spark, P.isnottrue(null_b)) is True
    assert _one(spark, P.isnotfalse(null_b)) is True
    assert _one(spark, P.istrue(F.lit(True))) is True
    assert _one(spark, P.isfalse(F.lit(False))) is True


def test_decode_null_matches_null(spark):
    # DECODE treats NULL search == NULL expr as a match (case-expr.cc).
    v = _one(
        spark,
        P.decode(
            F.lit(None).cast("string"),
            F.lit("x"), F.lit(1),
            F.lit(None).cast("string"), F.lit(2),
            F.lit(0),
        ),
    )
    assert v == 2


def test_strleft_strright_edges(spark):
    assert _one(spark, P.strleft(F.lit("hello"), 99)) == "hello"
    assert _one(spark, P.strright(F.lit("hello"), 99)) == "hello"
    assert _one(spark, P.strright(F.lit("hello"), 0)) == ""
    assert _one(spark, P.strright(F.lit("hello"), 3)) == "llo"


def test_quotient(spark):
    assert _one(spark, P.quotient(F.lit(7), F.lit(2))) == 3
    assert _one(spark, P.quotient(F.lit(-7), F.lit(2))) == -3  # truncates toward 0
    assert _one(spark, P.quotient(F.lit(7), F.lit(0))) is None


def test_int_months_between(spark):
    a = F.lit("2024-03-15").cast("timestamp")
    b = F.lit("2024-01-31").cast("timestamp")
    assert _one(spark, P.int_months_between(a, b)) == 1
    assert _one(spark, P.int_months_between(b, a)) == -2


def test_trunc_units(spark):
    t = F.lit("2024-05-17 13:45:33").cast("timestamp")
    cases = {"YYYY": "2024-01-01 00:00:00", "Q": "2024-04-01 00:00:00",
             "MM": "2024-05-01 00:00:00", "DD": "2024-05-17 00:00:00",
             "HH": "2024-05-17 13:00:00", "MI": "2024-05-17 13:45:00",
             "DAY": "2024-05-13 00:00:00"}  # Monday of that week
    for unit, expect in cases.items():
        got = _one(spark, P.trunc_ts(t, unit))
        assert str(got) == expect, (unit, got)
    with pytest.raises(ValueError):
        P.trunc_ts(t, "BOGUS")


def test_ts_interval_family_sql(spark):
    P.register_sql_functions(spark)
    rows = spark.sql(
        "SELECT milliseconds_add(timestamp'2024-01-01 00:00:00', 250) a, "
        "       microseconds_sub(timestamp'2024-01-01 00:00:00', 5) b, "
        "       weeks_add(timestamp'2024-01-01 00:00:00', 2) c, "
        "       years_sub(timestamp'2024-01-01 00:00:00', 1) d"
    ).collect()[0]
    assert str(rows["a"]) == "2024-01-01 00:00:00.250000"
    assert str(rows["b"]) == "2023-12-31 23:59:59.999995"
    assert str(rows["c"]) == "2024-01-15 00:00:00"
    assert str(rows["d"]) == "2023-01-01 00:00:00"


def test_sql_registration_names(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT strleft('abcdef', 2) a, strright('abcdef', 2) b, "
        "       rotateleft(1, 63) c, quotient(9, 4) d, countset(7) e, "
        "       istrue(CAST(NULL AS BOOLEAN)) f, setbit(0, 2) g"
    ).collect()[0]
    assert row["a"] == "ab" and row["b"] == "ef"
    assert row["c"] == -(1 << 63)
    assert row["d"] == 2 and row["e"] == 3
    assert row["f"] is False and row["g"] == 4


def test_misc_dialect_functions(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT fmod(CAST(10.5 AS DOUBLE), CAST(3.0 AS DOUBLE)) a, "
        "       fmod(CAST(-10.5 AS DOUBLE), CAST(3.0 AS DOUBLE)) b, "
        "       is_nan(CAST('NaN' AS DOUBLE)) c, is_nan(CAST(1.0 AS DOUBLE)) d, "
        "       is_inf(CAST('Infinity' AS DOUBLE)) e, is_inf(CAST(1.0 AS DOUBLE)) f, "
        "       effective_user() g, length(timeofday()) > 10 h, "
        "       dayname_full(timestamp'2024-01-01') i"
    ).collect()[0]
    assert abs(row["a"] - 1.5) < 1e-9
    assert abs(row["b"] + 1.5) < 1e-9  # truncated (C fmod), not floored
    assert row["c"] is True and row["d"] is False
    assert row["e"] is True and row["f"] is False
    assert isinstance(row["g"], str) and row["h"] is True
    assert row["i"] == "Monday"


def test_bit_named_ops_and_limits(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT bitand(12, 10) a, bitor(12, 10) b, bitxor(12, 10) c, bitnot(0) d, "
        "       max_tinyint() e, min_tinyint() f, max_smallint() g, min_smallint() h, "
        "       max_int() i, min_int() j, max_bigint() k, min_bigint() l"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (8, 14, 6, -1)
    assert (row["e"], row["f"]) == (127, -128)
    assert (row["g"], row["h"]) == (32767, -32768)
    assert (row["i"], row["j"]) == (2147483647, -2147483648)
    assert (row["k"], row["l"]) == ((1 << 63) - 1, -(1 << 63))


def test_timestamp_residue_functions(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT from_timestamp(timestamp'2024-05-17 13:45:33', 'yyyy-MM-dd HH:mm') a, "
        "       timestamp_cmp(timestamp'2024-01-01', timestamp'2024-01-02') b, "
        "       timestamp_cmp(timestamp'2024-01-02', timestamp'2024-01-01') c, "
        "       timestamp_cmp(timestamp'2024-01-01', timestamp'2024-01-01') d, "
        "       timestamp_cmp(CAST(NULL AS TIMESTAMP), timestamp'2024-01-01') e, "
        "       nanoseconds_add(timestamp'2024-01-01 00:00:00', 2500) f, "
        "       nanoseconds_sub(timestamp'2024-01-01 00:00:00', 3000) g"
    ).collect()[0]
    assert row["a"] == "2024-05-17 13:45"
    assert (row["b"], row["c"], row["d"], row["e"]) == (-1, 1, 0, None)
    # ns truncate to µs (Spark TIMESTAMP precision — documented)
    assert str(row["f"]) == "2024-01-01 00:00:00.000002"
    assert str(row["g"]) == "2023-12-31 23:59:59.999997"
    assert _one(spark, P.timestamp_cmp(
        F.lit("2024-01-01").cast("timestamp"), F.lit("2024-01-02").cast("timestamp"))) == -1


def test_regexp_match_count(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT regexp_match_count('aaa', 'a') a, "
        "       regexp_match_count('abcab', 'ab') b, "
        "       regexp_match_count('xyz', 'q') c"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (3, 2, 0)
    assert _one(spark, P.regexp_match_count(F.lit("a1b2c3"), r"\d")) == 3


def test_distinctfrom_operator_and_named_forms(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT (NULL IS DISTINCT FROM NULL) a, (1 IS DISTINCT FROM 2) b, "
        "       (NULL IS NOT DISTINCT FROM NULL) c, "
        "       distinctfrom(NULL, NULL) d, notdistinct('x', 'x') e"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (False, True, True)
    assert (row["d"], row["e"]) == (False, True)


def test_spark_native_dialect_names(spark):
    """Names the reference registers that are already Spark builtins —
    pinned so a Spark upgrade can't silently drop the dialect surface."""
    row = spark.sql(
        "SELECT bin(13) a, btrim('  x  ') b, chr(65) c, "
        "       date_part('YEAR', timestamp'2024-05-17') d, "
        "       regexp_like('acm', 'a.m') e, translate('aab', 'ab', 'xy') f, "
        "       conv('ff', 16, 10) g, find_in_set('b', 'a,b,c') h, "
        "       parse_url('http://h/p?q=1', 'HOST') i, split_part('a:b:c', ':', 2) j"
    ).collect()[0]
    assert row["a"] == "1101" and row["b"] == "x" and row["c"] == "A"
    assert row["d"] == 2024 and row["e"] is True and row["f"] == "xxy"
    assert row["g"] == "255" and row["h"] == 2
    assert row["i"] == "h" and row["j"] == "b"


def test_decimal_precision_scale_metadata(spark):
    df = spark.sql("SELECT CAST(1.25 AS DECIMAL(12,4)) d, 1 i")
    assert P.decimal_precision(df, "d") == 12
    assert P.decimal_scale(df, "d") == 4
    with pytest.raises(TypeError):
        P.decimal_precision(df, "i")


def test_fnv_hash_random_batch(spark):
    """Property check over a batch of random strings (seeded): the Spark
    expression equals the Python FNV-1a reference for arbitrary unicode."""
    import random

    rng = random.Random(42)
    alphabet = "abcXYZ 0189 éü漢字🙂\t"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))) for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s STRING")
    got = {r["s"]: r["h"] for r in df.select("s", P.fnv_hash(F.col("s")).alias("h")).collect()}
    for s in samples:
        assert got[s] == fnv1a64(s.encode("utf-8")), repr(s)


def test_rotate_random_batch(spark):
    import random

    rng = random.Random(7)
    cases = [(rng.getrandbits(64) - (1 << 63), rng.randint(0, 130)) for _ in range(100)]
    df = spark.createDataFrame([(x, n) for x, n in cases], "x LONG, n INT")
    got = df.select(
        "x", "n",
        P.rotateleft(F.col("x"), F.col("n")).alias("rl"),
        P.rotateright(F.col("x"), F.col("n")).alias("rr"),
    ).collect()
    for r in got:
        assert r["rl"] == rot64(r["x"] % (1 << 64), r["n"], True)
        assert r["rr"] == rot64(r["x"] % (1 << 64), r["n"], False)


def test_quotient_exact_above_double_precision(spark):
    # double-routed division would round these (ADVICE r1); DIV is exact
    big = (1 << 62) + 3
    assert _one(spark, P.quotient(F.lit(big), F.lit(3))) == big // 3
    assert _one(spark, P.quotient(F.lit(big), F.lit(1))) == big
    P.register_sql_functions(spark)
    row = spark.sql(f"SELECT quotient({big}, 3) q").collect()[0]
    assert row["q"] == big // 3


def test_fmod_extreme_ratio(spark):
    # |a/b| far beyond BIGINT range: the old trunc-multiply body saturated
    import math

    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT fmod(CAST(1e300 AS DOUBLE), CAST(1e-3 AS DOUBLE)) a"
    ).collect()[0]
    assert row["a"] is not None and abs(row["a"]) <= 1e-3
    assert row["a"] == math.fmod(1e300, 1e-3)


def test_double_alias_math_family(spark):
    """math-functions.cc d*-alias names (impala_functions.py:265-276):
    1-arg integral forms return BIGINT (llround / trunc-toward-zero
    semantics), transcendental forms DOUBLE."""
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT dceil(1.2) a, dfloor(-1.2) b, dtrunc(-2.7) c, dround(2.5) d, "
        "       dround(-2.5) e, dexp(0.0D) f, dlog1(e()) g, dlog10(100.0D) h, "
        "       dsqrt(9.0D) i, dpow(2.0D, 10.0D) j, fpow(3.0D, 2.0D) k"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (2, -2, -2)
    assert (row["d"], row["e"]) == (3, -3)  # half away from zero
    assert row["f"] == 1.0 and abs(row["g"] - 1.0) < 1e-12 and row["h"] == 2.0
    assert row["i"] == 3.0 and row["j"] == 1024.0 and row["k"] == 9.0


def test_adddate_subdate_interval_aliases(spark):
    P.register_sql_functions(spark)
    row = spark.sql(
        "SELECT adddate(timestamp'2024-01-30 12:00:00', 3) a, "
        "       subdate(timestamp'2024-01-30 12:00:00', 30) b, "
        "       months_add_interval(timestamp'2024-01-31 00:00:00', 1) c, "
        "       months_sub_interval(timestamp'2024-03-31 00:00:00', 1) d"
    ).collect()[0]
    assert str(row["a"]).startswith("2024-02-02 12:00:00")
    assert str(row["b"]).startswith("2023-12-31 12:00:00")
    # month arithmetic clamps to end-of-month (boost date semantics)
    assert str(row["c"]).startswith("2024-02-29")
    assert str(row["d"]).startswith("2024-02-29")


def test_sleep_blocks_and_returns_true(spark):
    import time

    P.register_sql_functions(spark)

    t0 = time.perf_counter()
    row = spark.sql("SELECT sleep(200) ok").collect()[0]
    assert row["ok"] is True
    assert time.perf_counter() - t0 >= 0.2
