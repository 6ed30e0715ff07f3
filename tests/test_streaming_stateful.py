"""Differential test for the custom stateful streaming operator:
closed sessions from applyInPandasWithState must agree with the batch
window-function sessionization (same 30-min gap) — every user's batch
session count equals their streamed closed-session count + 1 (the last
session stays open in state)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from minimised_impala_spark.streaming.stateful import (
    SESSION_GAP_S,
    streaming_sessionize_stateful,
)
from minimised_impala_spark.tables import load_table


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    streamed = streaming_sessionize_stateful(spark, sf_dir)
    per_user_closed = {
        r["user_id"]: r["n"]
        for r in streamed.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_user_closed, "expected some closed sessions"

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > SESSION_GAP_S),
        1,
    ).otherwise(0)
    batch = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("ns", new_session)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"))
    )
    per_user_batch = {r["user_id"]: r["n_sessions"] for r in batch.collect()}

    for user, n_batch in per_user_batch.items():
        n_closed = per_user_closed.get(user, 0)
        assert n_closed == n_batch - 1, (user, n_closed, n_batch)


def test_stateful_sessionize_schema_and_order(spark, sf_dir):
    df = streaming_sessionize_stateful(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
    ]
    rows = df.limit(50).collect()
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1
