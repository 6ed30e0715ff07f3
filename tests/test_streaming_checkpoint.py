"""Checkpointed restart / exactly-once resumption — the operational core
of streaming at scale: a stream that dies mid-corpus must resume from its
checkpoint and process each input file exactly once (no replays into the
sink, no gaps). The reference has no streaming (SURVEY §1.1); this pins
the Spark behavior the engine's streaming wing relies on.
"""

from __future__ import annotations

import shutil


def _run_stream_once(spark, in_dir: str, out_dir: str, ckpt: str, schema) -> None:
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(in_dir)
        .selectExpr("event_id", "user_id", "upper(event_type) AS event_type")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    from minimised_impala_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    first = events.filter("event_id % 2 = 0")
    second = events.filter("event_id % 2 = 1")

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 arrives; stream processes it and stops (simulated crash)
    first.write.mode("overwrite").parquet(in_dir)
    shutil.rmtree(f"{in_dir}/_spark_metadata", ignore_errors=True)
    schema = spark.read.parquet(in_dir).schema
    _run_stream_once(spark, in_dir, out_dir, ckpt, schema)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == first.count()

    # batch 2 arrives; a NEW stream resumes from the same checkpoint
    second.write.mode("append").parquet(in_dir)
    _run_stream_once(spark, in_dir, out_dir, ckpt, schema)

    out = spark.read.parquet(out_dir)
    total = events.count()
    assert out.count() == total  # every event exactly once — no replays
    assert out.select("event_id").distinct().count() == total
    # transformation applied on both runs
    assert out.filter("event_type != upper(event_type)").count() == 0
