"""Watermark / late-data semantics for streaming window aggregation:
in append mode a window is emitted only once the watermark passes its end,
and events arriving later than the watermark allows are dropped —
the state-bounding contract that makes streaming aggs safe at scale.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def staged(tmp_path):
    return str(tmp_path / "stream_src")


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "ts STRING, k STRING").select(
        F.col("ts").cast("timestamp").alias("ts"), "k"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_append_mode_watermark_finalizes_and_drops_late(spark, staged):
    import os

    os.makedirs(staged, exist_ok=True)
    # batch 1: two events in the 10:00 window, one in 11:00
    _write_batch(
        spark,
        staged,
        [("2024-01-01 10:05:00", "a"), ("2024-01-01 10:20:00", "a"), ("2024-01-01 11:10:00", "b")],
    )
    stream = (
        spark.readStream.schema("ts TIMESTAMP, k STRING").format("parquet").load(staged)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch 2: event at 13:00 → watermark advances to 12:30, past the
        # END of both the 10:00 and 11:00 windows → they finalize, emit,
        # and are EVICTED from state (bounded state: the scale contract).
        _write_batch(spark, staged, [("2024-01-01 13:00:00", "c")])
        q.processAllAvailable()
        # batch 3: an event for the already-evicted 10:00 window (too late:
        # watermark 12:30 > window end 11:00) must be dropped; 15:00
        # advances the watermark so the 13:00 window finalizes too.
        _write_batch(
            spark,
            staged,
            [("2024-01-01 10:30:00", "a"), ("2024-01-01 15:00:00", "d")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = [
        ((str(r["w"]["start"]), r["k"]), r["n"]) for r in spark.table(name).collect()
    ]
    rows = dict(emitted)
    assert len(emitted) == len(rows), f"window emitted twice: {emitted}"
    # finalized BEFORE the too-late 10:30 event: count stays 2, and the
    # late row must not re-open the window (no second emission)
    assert rows.get(("2024-01-01 10:00:00", "a")) == 2
    assert rows.get(("2024-01-01 11:00:00", "b")) == 1
    assert rows.get(("2024-01-01 13:00:00", "c")) == 1
    # the 15:00 window is still open (watermark hasn't passed its end) —
    # append mode must NOT have emitted it
    assert ("2024-01-01 15:00:00", "d") not in rows


def test_drop_duplicates_within_watermark(spark, staged):
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped; state for expired keys is evictable
    (dropDuplicatesWithinWatermark — the 100 TB ingestion-dedup shape)."""
    import os

    os.makedirs(staged, exist_ok=True)
    # batch 1: id 1 twice (replay) + id 2 once
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1), ("2024-01-01 10:00:01", 1), ("2024-01-01 10:01:00", 2)],
        "ts STRING, event_id LONG",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")
    df.coalesce(1).write.mode("append").parquet(staged)

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_id LONG").format("parquet").load(staged)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"wmdd_{uuid.uuid4().hex[:8]}"
    q = stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # batch 2: id 2 replayed within horizon → dropped; id 3 new → kept
        df2 = spark.createDataFrame(
            [("2024-01-01 10:02:00", 2), ("2024-01-01 10:03:00", 3)],
            "ts STRING, event_id LONG",
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")
        df2.coalesce(1).write.mode("append").parquet(staged)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["event_id"] for r in spark.table(name).collect())
    assert got == [1, 2, 3]


def test_file_sink_exactly_once_across_restart(spark, staged, tmp_path):
    """Checkpointed parquet file sink: restarting the query from the same
    checkpoint must not re-emit already-committed batches, and new input
    after restart lands exactly once — the exactly-once contract a
    training-data ingestion pipeline relies on when archiving a stream."""
    import os

    os.makedirs(staged, exist_ok=True)
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    def start():
        return (
            spark.readStream.schema("ts TIMESTAMP, k STRING")
            .format("parquet")
            .load(staged)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    _write_batch(spark, staged, [("2024-01-01 10:00:00", "a"), ("2024-01-01 10:01:00", "b")])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # restart from the same checkpoint; add one more record
    _write_batch(spark, staged, [("2024-01-01 10:02:00", "c")])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == ["a", "b", "c"]
