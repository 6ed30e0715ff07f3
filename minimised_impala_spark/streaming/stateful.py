"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (extension — the reference has no streaming,
SURVEY §1.1; the batch equivalent with a full SQL oracle is
queries/events.py events_sessionize).

This is the engine's template for operators Spark's built-ins can't
express: arbitrary per-key state machines over a stream. State here is one
open session per user (start, last-seen, count); an event later than
SESSION_GAP after last-seen closes the session and emits it. Sessions still
open when the bounded fixture ends stay in state — exactly streaming
semantics (an unbounded source would close them via a later event or a
state timeout; a timeout flush is deliberately not used here because
processing-time timeouts keep a bounded memory-sink query triggering
forever).

Scale notes: state is hash-partitioned by user_id across executors and
checkpointed through the state store; throughput is Arrow-batched (one
pandas frame per key-group per trigger), the supported 100 TB shape for
custom stateful logic.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.streaming.windows import _events_stream

# _sessionize_group ships to workers — see serde module docstring
from minimised_impala_spark.serde import pickle_module_by_value

pickle_module_by_value(__name__)

SESSION_GAP_S = 30 * 60  # 30 min, matches events_sessionize's batch gap

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this key-group's new events into the open-session state,
    emitting every session closed by a >gap jump (or by state timeout)."""
    (user_id,) = key
    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
    ts_us.sort()
    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
    for t in ts_us:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > SESSION_GAP_S * 1_000_000:
            out["user_id"].append(user_id)
            out["session_start"].append(pd.Timestamp(start_us, unit="us"))
            out["session_end"].append(pd.Timestamp(last_us, unit="us"))
            out["n_events"].append(n)
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    state.update((start_us, last_us, n))
    if out["user_id"]:
        yield pd.DataFrame(out)


# The operator's MECHANISM (applyInPandasWithState over a stream) is not
# SQL — but on a bounded replay its OUTPUT is: closed sessions are
# standard gap-sessionization (strict >30 min jumps) minus each user's
# final session, which stays open in state. That equivalence gives the
# custom stateful operator a hard value-hash oracle instead of the weaker
# rows-only check; the streaming semantics themselves (state survival,
# watermarks, checkpoint restart) are pinned by the pytest suite.
_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
agg AS (
  SELECT user_id, sid,
         min(ts) AS session_start, max(ts) AS session_end,
         CAST(count(*) AS BIGINT) AS n_events,
         max(sid) OVER (PARTITION BY user_id) AS max_sid
  FROM sess
  GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events
FROM agg
WHERE sid < max_sid
ORDER BY user_id, session_start
"""


@query("streaming_sessionize_stateful", oracle=_SESSIONIZE_ORACLE)
def streaming_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the sessionizer over the bounded events stream and return all
    closed sessions (the fixture arrives as one micro-batch, so every
    within-batch >gap jump closes a session; the last session per user
    stays open in state, as it would on a live stream)."""
    events = _events_stream(spark, sf_dir).select("user_id", "ts")
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"sess_out_{uuid.uuid4().hex[:8]}"
    q = sessions.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("user_id", "session_start")
