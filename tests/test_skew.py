"""Salted-join / salted-agg correctness: results must be identical to the
unsalted equivalents on skewed data (one hot key holding most rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minimised_impala_spark.operators.skew import salted_groupby_count, salted_join


def _skewed(spark):
    # 10k rows: 80% on key 7, the rest spread over 100 keys
    return spark.range(10000).select(
        F.when(F.col("id") % 5 != 0, F.lit(7))
        .otherwise(F.col("id") % 100)
        .cast("int")
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )


def _dim(spark):
    return spark.range(100).select(
        F.col("id").cast("int").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _skewed(spark), _dim(spark)
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=8)
    cols = ["k", "v", "name"]
    assert _canon(salted, cols) == _canon(plain, cols)


def test_salted_left_join_matches_plain(spark):
    fact = _skewed(spark).withColumn("k", F.col("k") + 50)  # some keys unmatched
    dim = _dim(spark)
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", n_salts=4, how="left")
    cols = ["k", "v", "name"]
    assert _canon(salted, cols) == _canon(plain, cols)


def test_salted_join_spreads_hot_key(spark):
    """The hot key must land in several shuffle partitions: the salted
    probe side has >1 distinct (k, salt) combination for the hot key."""
    fact = _skewed(spark)
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(8))
    n_groups = (
        fact.withColumn("_salt", salt)
        .filter("k = 7")
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_groups > 1


def test_salted_groupby_count_matches_plain(spark):
    fact = _skewed(spark)
    plain = fact.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    salted = salted_groupby_count(fact, "k", n_salts=8)
    assert _canon(salted, ["k", "n"]) == _canon(plain, ["k", "n"])


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_join(_skewed(spark), _dim(spark), "k", how="right")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's OptimizeSkewedJoin must engage on a skewed sort-merge join
    (the runtime half of the skew story — salting above is the manual
    half). With the skew thresholds lowered to test scale, the hot key's
    partition must be split: the executed plan marks the join skew=true.
    At 100 TB these thresholds are the defaults (256 MB / 5× median) and
    this is what absorbs a hot user_id or null-heavy key without a manual
    salt."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(100_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 100)
            .cast("int")
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pay"),
        )
        # second big side so neither broadcasts and SMJ is chosen; the
        # probe stays 1:1-ish so the collect below is bounded
        right = spark.range(100).select(
            (F.col("id") % 100).cast("int").alias("k"),
            F.col("id").alias("rv"),
        )
        joined = big.join(right, "k")
        # execute THIS dataset (count() would run a different plan and
        # leave joined's own AQE plan unfinalized)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
