"""Skew-mitigation join operators.

AQE's skew-join handling (enabled in session.ENGINE_CONF) splits
oversized *sort-merge* partitions automatically; salting is the manual
fallback for the cases AQE can't fix — e.g. a broadcast-ineligible join
where one hot key dominates, or aggregations over a hot group. The
reference had no answer to skew beyond its cost-based join inversion
(fe/src/main/java/com/cloudera/impala/planner/SingleNodePlanner.java:422
invertJoin keeps the largest input on the probe side); at 100 TB explicit
salting is part of the engine surface.

``salted_join``: the probe side gets a uniform salt in [0, n); the build
side is replicated n× (one copy per salt value); the join key becomes
(key, salt), so one hot key's rows spread over n shuffle partitions.
Correctness is salt-invariant: every probe row still meets every matching
build row exactly once.

``salted_groupby_count``: two-phase aggregation for hot group keys —
partial count per (key, salt), then final sum per key. (Spark's partial
aggregation already does this for algebraic aggregates; the helper is the
template for non-algebraic ones, e.g. collect-heavy or UDAF states.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated.

    ``on`` columns must exist on both sides (same names). Supported
    ``how``: inner / left joins (semantics preserved because every build
    row exists under every salt)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic uniform salt derived from the whole probe row
    salt_src: Column = F.hash(*[F.col(c) for c in probe.columns])
    p = probe.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    b = build.withColumn("_salt", F.explode(salts))
    joined = p.join(b, keys + ["_salt"], how)
    return joined.drop("_salt")


def salted_groupby_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """count(*) per key via (key, salt) partial + final combine."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_pc"))
    )
    return partial.groupBy(key).agg(F.sum("_pc").cast("bigint").alias("n"))
