"""Structured Streaming operators (extension — the reference has no
streaming: SURVEY §1.1; TPlanNodeType contains no stream operator).

Batch-equivalent semantics are declared in queries/events.py; this module
runs the same aggregations through readStream → writeStream so the engine
covers the streaming entry point: tumbling-window counts with a watermark,
driven to completion over the parquet fixture via the memory sink.

``streaming_window_counts`` is registered with a full SQL oracle: in
"complete" output mode every window is emitted once the (single) batch is
processed, so the result equals the batch aggregation.

Scale notes: in production the source is Kafka/files-on-arrival; the
watermark bounds state (windows older than watermark are evicted), and the
aggregation state is hash-partitioned by (window, event_type) across
executors — identical shuffle shape to the batch plan.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.queries.registry import query


def _reconcile_stage_links(stage: str, expected: dict[str, str]) -> None:
    """Make the stage dir contain EXACTLY the symlinks in `expected`
    (name -> target), each pointing at its current target.

    A fixture regeneration changes Spark part filenames, so an old
    link's target vanishes: os.path.exists(link) FOLLOWS the link and
    returns False, a blind re-symlink raises FileExistsError, and the
    dangling link persists — the stream then reads missing/partial
    input, the silent-empty-input class the r10 sf1 sweep caught.
    lexists sees the link itself; a link whose realpath no longer
    matches the (realpath'd) target is removed and re-created."""
    import os

    for name in os.listdir(stage):
        if name not in expected:
            os.remove(os.path.join(stage, name))
    for name, target in expected.items():
        link = os.path.join(stage, name)
        want = os.path.realpath(target)
        if os.path.lexists(link) and os.path.realpath(link) == want:
            continue
        # Create-or-repair ATOMICALLY: symlink at a pid-unique temp name,
        # then rename over the link path. os.replace is a single rename
        # syscall, so two sessions repairing the same stale link can no
        # longer interleave remove/symlink and crash on FileExistsError
        # (the r11 ADVICE TOCTOU) — last writer wins, and every writer
        # writes the same realpath'd target.
        tmp = f"{link}.tmp.{os.getpid()}"
        if os.path.lexists(tmp):  # leftover from a crashed same-pid run
            os.remove(tmp)
        os.symlink(target, tmp)
        os.replace(tmp, link)


def _events_stream(spark: SparkSession, sf_dir: str, copies: int = 1) -> DataFrame:
    # ts encoding varies by fixture vintage — the shared tables.fix_events_ts
    # helper dispatches on the loaded dtype. The file stream source requires
    # a *directory*, so stage a symlink dir (fixture dirs are read-only).
    # copies > 1 stages the same file multiple times — the at-least-once
    # replay scenario streaming dedup exists for.
    import hashlib
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.realpath(f"{sf_dir}/events.parquet")
    suffix = "" if copies == 1 else f"_x{copies}"
    stage = f"/tmp/mis_stream_{hashlib.md5(src.encode()).hexdigest()[:10]}{suffix}"
    os.makedirs(stage, exist_ok=True)
    # The table may be a single parquet FILE (driver fixtures) or a
    # Spark-written DIRECTORY of part files (tools/make_sf1.py). The file
    # stream source lists the stage dir non-recursively, so a symlink to
    # a directory stages ZERO files (caught by the r10 sf1 oracle sweep:
    # every streaming query read 0 rows at sf1) — link each part file.
    if os.path.isdir(src):
        parts = sorted(
            os.path.join(src, p)
            for p in os.listdir(src)
            if p.endswith(".parquet")
        )
    else:
        parts = [src]
    expected = {
        f"events_{i}_{j}.parquet": parts[j]
        for i in range(copies)
        for j in range(len(parts))
    }
    _reconcile_stage_links(stage, expected)
    from minimised_impala_spark.tables import fix_events_ts

    schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    return fix_events_ts(raw)


@query(
    "streaming_window_counts",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts via a real streaming query (memory sink,
    complete mode), returned as a static DataFrame once the fixture is fully
    processed."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


@query(
    "streaming_sliding_counts",
    oracle="""
WITH starts AS (
  SELECT ts, event_type, time_bucket(INTERVAL '30 minutes', ts) AS w FROM events
  UNION ALL
  SELECT ts, event_type,
         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w
  FROM events
)
SELECT w AS window_start, event_type, count(*) AS n
FROM starts
GROUP BY w, event_type
ORDER BY window_start, event_type
""",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour / 30-minute-slide event counts via readStream: every
    event belongs to two overlapping windows (the oracle materializes both
    window starts per event). Same complete-mode memory-sink drive as
    streaming_window_counts."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"stream_slide_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


@query(
    "streaming_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM islands
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) over the event stream —
    Spark's built-in dynamic-gap windowing; the applyInPandasWithState
    sessionizer (streaming/stateful.py) is the custom-logic variant of
    the same operator. Oracle: gaps-and-islands in plain SQL."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
    )


@query(
    "streaming_dedup_exact",
    oracle="""
SELECT event_type, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — the ingestion-side dedup of a training-data
    pipeline (at-least-once sources replay records; state keyed on the
    record id drops replays). The stream carries every event twice
    (duplicated stage dir); dropDuplicates on event_id restores
    exactly-once, proven by the per-type counts matching the batch oracle
    over the ORIGINAL (single-copy) events table.

    Scale: dedup state is hash-partitioned on event_id across executors;
    with a watermark the state is bounded to the replay horizon
    (dropDuplicatesWithinWatermark). Here the fixture is finite, so the
    unbounded variant is exercised and the watermarked variant is covered
    in tests/test_streaming_watermark.py.
    """
    deduped = _events_stream(spark, sf_dir, copies=2).dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("event_type", "n").orderBy("event_type")


@query(
    "streaming_dedup_watermarked",
    oracle="""
SELECT event_type, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup: dropDuplicatesWithinWatermark keeps
    dedup state only for the watermark horizon (1 h here) instead of
    forever — the 100 TB ingestion shape, where unbounded dedup state
    (streaming_dedup_exact) would grow with the stream. Replayed records
    land with the ORIGINAL event time, so an at-least-once source's
    replays always fall inside the horizon and are dropped exactly like
    the unbounded variant; only replays older than the watermark (a bug,
    not a delivery retry) would slip through. The doubled stage dir
    arrives in one micro-batch, so the per-type counts equal the batch
    aggregation over the single-copy events table.

    Scale: state is hash-partitioned on event_id and EVICTED once the
    watermark passes, so state size ∝ events-per-horizon, not
    events-ever — the property the unbounded variant lacks.
    """
    deduped = (
        _events_stream(spark, sf_dir, copies=2)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"stream_dedup_wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("event_type", "n").orderBy("event_type")


@query(
    "streaming_outer_join",
    oracle="""
WITH v AS (SELECT event_id AS view_id, user_id, ts AS v_ts
           FROM events WHERE event_type = 'view'),
c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
      FROM events WHERE event_type = 'click'),
wm AS (SELECT least((SELECT max(v_ts) FROM v), (SELECT max(c_ts) FROM c))
              - INTERVAL '1 hour' AS w),
j AS (
  SELECT v.user_id, v.v_ts, c.click_id
  FROM v LEFT JOIN c
    ON c.c_user = v.user_id
   AND c.c_ts >= v.v_ts
   AND c.c_ts <= v.v_ts + INTERVAL '15 minutes'
)
SELECT user_id,
       count(click_id)                                      AS n_matched,
       CAST(sum(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                            AS n_expired
FROM j, wm
WHERE click_id IS NOT NULL OR v_ts + INTERVAL '15 minutes' < wm.w
GROUP BY user_id
ORDER BY user_id
""",
)
def streaming_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join with watermarked state
    eviction: views left-joined to clicks within 15 minutes. Matches emit
    immediately; an unmatched view emits its null-padded row only once the
    global watermark (min over both streams of max-event-time − 1 h)
    passes the end of its join window — i.e. once no future click can
    match it. Views still inside the horizon stay in state, so the result
    set is exactly: all matches, plus nulls for views with
    v_ts + 15 min < watermark (verified boundary-exact against the batch
    reconstruction in the oracle; final no-data micro-batch flushes are
    on by default — spark.sql.streaming.noDataMicroBatches.enabled).

    Scale: same shape as streaming_attribution_join (hash-partition on
    user_id, state ∝ interval + watermark slack); the outer variant adds
    only the eviction-time null emission, no extra state.
    """
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    pairs = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 15 MINUTES")),
        "leftOuter",
    )
    name = f"stream_oj_{uuid.uuid4().hex[:8]}"
    q = pairs.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count("click_id").alias("n_matched"),
            F.sum(F.col("click_id").isNull().cast("bigint")).alias("n_expired"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_attribution_join",
    oracle="""
SELECT a.user_id AS user_id, count(*) AS n_pairs,
       min(b.event_id) AS first_click_id
FROM events a JOIN events b ON b.user_id = a.user_id
WHERE a.event_type = 'view' AND b.event_type = 'click'
  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '15 minutes'
GROUP BY a.user_id
ORDER BY user_id
""",
)
def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click attribution): views joined to
    clicks by the same user within 15 minutes, both sides real streams.
    Inner stream-stream joins emit matches immediately (append mode); the
    watermarks + the time-range conjunct let Spark evict join state older
    than the horizon, so state stays bounded on an unbounded source.

    Scale: both streams hash-partition on user_id (the equi key); state per
    key is limited to the 15-minute interval plus watermark slack. The
    post-sink per-user rollup is batch (the join IS the streaming part).
    """
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    pairs = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 15 MINUTES")),
    )
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    q = pairs.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("click_id").alias("first_click_id"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_enrich_join",
    oracle="""
SELECT c.c_mktsegment AS segment, count(*) AS n,
       round(sum(e.value) * 100) / 100 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY segment
""",
)
def streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the standard streaming-ingestion
    shape: the event stream joins a static dimension (per-batch broadcast
    hash join; the static side is re-resolvable each micro-batch, so
    dimension updates are picked up without restarting). Aggregated per
    segment and verified against the batch oracle.

    Determinism: value is a 2-decimal fixed-point DOUBLE in the fixture,
    so the standard ×100 scaled-round shim applies.
    """
    from minimised_impala_spark.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = _events_stream(spark, sf_dir).join(
        cust, F.col("user_id") == F.col("c_custkey")
    )
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.sum("value") * 100, 0) / 100).alias("sum_value"),
    )
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("segment", "n", "sum_value").orderBy("segment")


# --------------------------------------------------------------------------
# foreachBatch exactly-once file sink — the production pattern for landing
# streaming results in a table: each micro-batch receives the full
# complete-mode snapshot and overwrites the output atomically, so a
# replayed/retried batch rewrites the identical state instead of
# duplicating it (idempotent-by-construction; Spark's own docs pattern
# for exactly-once with non-transactional sinks). The declared query runs
# the stream to completion, then reads the LANDED PARQUET back — the
# hashed rows physically passed through the foreachBatch sink.
@query(
    "streaming_foreach_batch_sink",
    oracle="""
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type,
       count(*) AS n,
       round(sum(value) * 100) / 100 AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
)
def streaming_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os

    src = os.path.realpath(f"{sf_dir}/events.parquet")
    out = f"/tmp/mis_fbsink_{hashlib.md5(src.encode()).hexdigest()[:10]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum("value") * 100, 0) / 100).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(out)

    q = agg.writeStream.outputMode("complete").foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).orderBy("window_start", "event_type")


@query(
    "streaming_topk_windowed",
    oracle="""
WITH c AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
         count(*) AS n
  FROM events
  GROUP BY window_start, event_type
),
r AS (
  SELECT window_start, event_type, n,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT window_start, event_type, n, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 2
ORDER BY window_start, rk
""",
)
def streaming_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: top-2 event types per tumbling hour. The
    windowed count is the STREAMING stage (watermarked, state bounded);
    the rank is applied per micro-batch over the sink table — ranking
    inside the stream is unsupported for update-mode aggs, and the
    post-sink rank over the (small) per-window aggregate table is the
    standard production split: heavy count state lives in the stream,
    the cheap top-k runs on serving read. Scale: stream state is
    |windows|×|event types|; the rank input is already aggregated, so
    the batch window sees thousands of rows, not raw events."""
    from pyspark.sql import Window as W

    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wr = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        spark.table(name)
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .withColumn("rk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rk") <= 2)
        .orderBy("window_start", "rk")
    )


@query(
    "streaming_upsert_sink",
    oracle="""
WITH latest AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events WHERE user_id < 80
)
SELECT user_id, ts AS last_ts, CAST(event_id AS BIGINT) AS last_event_id,
       value AS last_value
FROM latest WHERE rk = 1
ORDER BY user_id
""",
)
def streaming_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert sink: foreachBatch MERGEs each micro-batch's
    latest-row-per-key into a keyed parquet dimension (read target →
    union batch winners → re-rank → atomic directory swap). The source
    replays the fixture TWICE (copies=2, the at-least-once scenario):
    correctness of the final table proves the upsert is IDEMPOTENT —
    replayed rows lose the (ts, event_id) tie-break to themselves and
    change nothing. The driver hash covers the physically-landed parquet.
    Scale: the merge is one shuffle on the key per batch; on a
    partitioned target use dynamic partition overwrite so only touched
    key ranges rewrite (same seam as pipeline_merge_upsert)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import Window as W

    # Per-run unique target (uuid, not fixture-keyed): a fixed path raced
    # under concurrent sessions on the same fixture and leaked stale state
    # between runs (ADVICE r4). localCheckpoint at the end lets the
    # scratch dir be removed before returning.
    out = f"/tmp/mis_upsert_{uuid.uuid4().hex[:12]}"

    stream = _events_stream(spark, sf_dir, copies=2).filter(F.col("user_id") < 80)
    rk = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def upsert_batch(bdf: DataFrame, batch_id: int) -> None:
        winners = (
            bdf.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1)
            .select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_id").cast("bigint").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
        )
        if os.path.exists(out):
            target = bdf.sparkSession.read.parquet(out)
            merged = (
                target.unionByName(winners)
                .withColumn(
                    "rn",
                    F.row_number().over(
                        W.partitionBy("user_id").orderBy(
                            F.desc("last_ts"), F.desc("last_event_id")
                        )
                    ),
                )
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        else:
            merged = winners
        staging = f"{out}.staging"
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(out, ignore_errors=True)
        os.rename(staging, out)

    q = stream.writeStream.outputMode("append").foreachBatch(upsert_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.read.parquet(out).orderBy("user_id").localCheckpoint(eager=True)
    shutil.rmtree(out, ignore_errors=True)
    return res


# --------------------------------------------------------------------------
# Streaming distribution-drift detection: the monitoring primitive a
# training-data ingestion pipeline runs continuously — per tumbling
# window, compare the incoming event-type distribution against the
# corpus baseline via KL divergence KL(p_w ‖ q) = Σ_t p·ln(p/q). The
# stateful streaming part is the watermarked windowed count (state
# evicted past the watermark); the KL finish runs over the landed sink
# rows against the (tiny, broadcast) baseline distribution — the same
# sink-side finishing pattern as streaming_topk_windowed. All
# probability inputs are integer counts, so both engines evaluate
# identical double expressions; the per-window sum spans ≤|event types|
# terms and is rounded at 6 decimals. At 100 TB/day: state per window is
# |event types| longs, the baseline is kilobytes, and a drift alert is a
# filter on the output — nothing scales with the stream length.
@query(
    "streaming_drift_kl",
    oracle="""
WITH counts AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS w, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY w, event_type
),
wt AS (SELECT w, CAST(sum(n) AS BIGINT) AS tot FROM counts GROUP BY w),
base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM events
  GROUP BY event_type
),
bt AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM base)
SELECT wt.w AS window_start,
       wt.tot AS n_events,
       round(sum((n * 1.0 / wt.tot)
                 * ln((n * 1.0 / wt.tot) / (c * 1.0 / bt.total))), 6) AS kl
FROM counts
JOIN wt ON wt.w = counts.w
JOIN base ON base.event_type = counts.event_type
CROSS JOIN bt
GROUP BY wt.w, wt.tot
ORDER BY window_start
""",
)
def streaming_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from minimised_impala_spark.tables import load_table

    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    )
    wt = counts.groupBy("window_start").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    events = load_table(spark, sf_dir, "events")
    base = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bt = base.agg(F.sum("c").cast("bigint").alias("total"))
    p = F.col("n") * 1.0 / F.col("tot")
    qd = F.col("c") * 1.0 / F.col("total")
    return (
        counts.join(wt, "window_start")
        .join(F.broadcast(base), "event_type")
        .crossJoin(F.broadcast(bt))
        .groupBy("window_start", "tot")
        .agg(F.round(F.sum(p * F.log(p / qd)), 6).alias("kl"))
        .select(
            "window_start",
            F.col("tot").alias("n_events"),
            "kl",
        )
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Streaming near-dup detection against a LANDED corpus — the production
# shape of continuous ingest dedup (the batch formulation is
# dedup_incremental; this runs the identical probe per micro-batch): the
# corpus band index and shingle sets build ONCE (localCheckpoint — the
# persistable index), each arriving batch computes its own MinHash band
# signatures with the same dedup.bands_of kernel, semi-joins the band
# index for candidates, exact-rescores trigram Jaccard against only the
# matched corpus docs, and appends (new_id, match_id, jaccard) to the
# sink. The oracle is the same relational statement as
# dedup_incremental's, so the streaming path must reproduce the batch
# answer exactly. At 100 TB/day: per-batch cost ∝ batch bands + band
# collisions, never corpus size; the index is the thing a real pipeline
# persists and reloads.
def _docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    stage = f"/tmp/mis_docstream_{hashlib.md5(src.encode()).hexdigest()[:10]}"
    os.makedirs(stage, exist_ok=True)
    # single file or Spark directory-of-parts (see _events_stream note)
    if os.path.isdir(src):
        parts = sorted(
            os.path.join(src, p)
            for p in os.listdir(src)
            if p.endswith(".parquet")
        )
    else:
        parts = [src]
    expected = {f"documents_{j}.parquet": parts[j] for j in range(len(parts))}
    _reconcile_stage_links(stage, expected)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).format("parquet").load(stage)


def _stream_lsh_oracle() -> str:
    from minimised_impala_spark.extensions.dedup import _minhash_bands_cte

    return f"""
WITH {_minhash_bands_cte()},
cand AS (
  SELECT DISTINCT b1.doc_id AS new_id, b2.doc_id AS corpus_id
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.bsig = b2.bsig
   AND b1.doc_id % 10 = 7 AND b2.doc_id % 10 <> 7
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.corpus_id, count(*) AS c
  FROM cand c
  JOIN shingles s1 ON s1.doc_id = c.new_id
  JOIN shingles s2 ON s2.doc_id = c.corpus_id AND s2.sh = s1.sh
  GROUP BY c.new_id, c.corpus_id
),
scored AS (
  SELECT i.new_id, i.corpus_id,
         i.c * 1.0 / (z1.sz + z2.sz - i.c) AS jac
  FROM inter i
  JOIN sizes z1 ON z1.doc_id = i.new_id
  JOIN sizes z2 ON z2.doc_id = i.corpus_id
  WHERE i.c * 1.0 / (z1.sz + z2.sz - i.c) >= 0.6
),
best AS (
  SELECT new_id, corpus_id, jac,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY jac DESC, corpus_id) AS r
  FROM scored
)
SELECT new_id, corpus_id AS match_id, round(jac, 6) AS jaccard
FROM best WHERE r = 1
ORDER BY new_id
"""


@query("streaming_dedup_lsh", oracle=_stream_lsh_oracle())
def streaming_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql import Window as W

    from minimised_impala_spark.extensions import dedup as D

    full = D.corpus(spark, sf_dir)
    is_new = F.col("doc_id") % 10 == 7
    static_docs = full.filter(~is_new)
    # the landed index: built once, probed per batch
    static_bands = (
        D.bands_of(static_docs)
        .select(F.col("doc_id").alias("corpus_id"), "band", "bsig")
        .localCheckpoint(eager=False)
    )
    static_sets = (
        D.shingles_of(static_docs)
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("s2"))
        .select(F.col("doc_id").alias("corpus_id"), "s2")
        .localCheckpoint(eager=False)
    )

    out = f"/tmp/mis_sdlsh_{uuid.uuid4().hex[:12]}"

    def probe_batch(bdf: DataFrame, batch_id: int) -> None:
        docs = bdf.select("doc_id", "text")
        twins = docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.when(F.col("doc_id") % 5 == 0, F.col("text"))
            .otherwise(F.expr("substring(text, instr(text, ' ') + 1)"))
            .alias("text"),
        )
        new_docs = docs.unionAll(twins).filter(F.col("doc_id") % 10 == 7)
        nb = D.bands_of(new_docs).select(
            F.col("doc_id").alias("new_id"), "band", "bsig"
        )
        cand = (
            nb.join(static_bands, ["band", "bsig"])
            .select("new_id", "corpus_id")
            .distinct()
        )
        s1 = (
            D.shingles_of(new_docs)
            .groupBy("doc_id")
            .agg(F.collect_set("sh").alias("s1"))
            .select(F.col("doc_id").alias("new_id"), "s1")
        )
        c = F.size(F.array_intersect("s1", "s2"))
        jac = c * 1.0 / (F.size("s1") + F.size("s2") - c)
        w = W.partitionBy("new_id").orderBy(F.desc("jac"), F.asc("corpus_id"))
        (
            cand.join(s1, "new_id")
            .join(static_sets, "corpus_id")
            .select("new_id", "corpus_id", jac.alias("jac"))
            .filter(F.col("jac") >= 0.6)
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select(
                "new_id",
                F.col("corpus_id").alias("match_id"),
                F.round("jac", 6).alias("jaccard"),
            )
            .write.mode("append").parquet(out)
        )

    q = (
        _docs_stream(spark, sf_dir)
        .writeStream.outputMode("append")
        .foreachBatch(probe_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = (
        spark.read.parquet(out).orderBy("new_id").localCheckpoint(eager=True)
        if os.path.exists(out)
        else spark.createDataFrame(
            [], "new_id bigint, match_id bigint, jaccard double"
        )
    )
    shutil.rmtree(out, ignore_errors=True)
    return res


@query(
    "streaming_window_unique_users",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       count(DISTINCT user_id) AS n_unique
FROM events
GROUP BY window_start
ORDER BY window_start
""",
)
def streaming_window_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique users per tumbling hour on a stream. Streaming aggregation
    cannot evaluate count(DISTINCT ·) directly (distinct state is
    unbounded per group), so the standard two-phase rewrite runs instead:
    watermarked dedup on (user_id, hour bucket) — state bounded by the
    watermark horizon via dropDuplicatesWithinWatermark — feeding a
    plain windowed count. Chained stateful operators (dedup → agg) are
    the load-bearing part: Spark executes them as two state stores in
    one query. The fixture arrives in one micro-batch (watermark still
    at epoch), so no dedup state is evicted mid-run and the result is
    the exact batch distinct count the oracle computes.

    Scale: dedup state ∝ active (user, hour) pairs inside the horizon,
    agg state ∝ open windows — both watermark-bounded; shuffle is
    hash-partitioned on the dedup keys then the window key, the same
    two-exchange shape as the batch two-phase distinct rewrite."""
    src = _events_stream(spark, sf_dir)
    deduped = (
        src.withWatermark("ts", "1 hour")
        .withColumn("wstart", F.date_trunc("hour", F.col("ts")))
        .dropDuplicatesWithinWatermark(["user_id", "wstart"])
    )
    agg = deduped.groupBy("wstart").agg(F.count(F.lit(1)).alias("n_unique"))
    name = f"stream_uniq_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .select(F.col("wstart").alias("window_start"), "n_unique")
        .orderBy("window_start")
    )
