"""Custom stateful streaming operator: per-user sessionization with an
event-time gap timeout, via ``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.9); this is the engine's
custom-stateful surface for the incremental-ingest path — the shape any
bespoke stateful operator (dedup-within-horizon, per-key rate models,
incremental conflation state) drops into:

- state lives per group key in the state store (checkpointed — a restarted
  query resumes with sessions intact, proven in tests);
- event-time timeout closes idle sessions once the watermark passes
  ``last_event + gap`` (late data within the watermark still merges);
- all data movement is Arrow-batched pandas, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
# state tuple: (start_ms, end_ms, n_events, total_value)
SESSION_STATE_SCHEMA = "start_ms long, end_ms long, n int, total double"


def _emit(user_id: int, start_ms: int, end_ms: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(end_ms, unit="ms")],
            "n_events": [n],
            "total_value": [round(total, 6)],
        }
    )


def _session_fn(gap_ms: int):
    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield _emit(user_id, start_ms, end_ms, n, total)
            return

        # gather this batch's events for the key
        ts_ms: list[int] = []
        vals: list[float] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_ms.extend((pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000).tolist())
            vals.extend(pdf["value"].astype(float).tolist())
        if not ts_ms:
            return
        order = sorted(range(len(ts_ms)), key=lambda i: ts_ms[i])
        ts_ms = [ts_ms[i] for i in order]
        vals = [vals[i] for i in order]

        if state.exists:
            start_ms, end_ms, n, total = state.get
        else:
            start_ms, end_ms, n, total = ts_ms[0], ts_ms[0], 0, 0.0

        # merge events into sessions, emitting every session closed by a gap
        for t, v in zip(ts_ms, vals):
            if n > 0 and t - end_ms > gap_ms:
                yield _emit(user_id, start_ms, end_ms, n, total)
                start_ms, n, total = t, 0, 0.0
            end_ms = max(end_ms, t)
            n += 1
            total += v
        state.update((start_ms, end_ms, n, total))
        # close the open session once the watermark passes end + gap
        state.setTimeoutTimestamp(end_ms + gap_ms)

    return fn


def sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Events (ts timestamp, user_id long, value double, ...) → closed
    sessions.  A session closes when a later event arrives more than ``gap``
    after it, or when the event-time watermark passes its last event + gap."""
    n, unit = gap.split()
    gap_ms = int(n) * {"seconds": 1_000, "minutes": 60_000, "hours": 3_600_000}[unit]
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessions_available_now(
    spark, src_path: str, out_path: str, checkpoint_path: str, gap: str = "10 minutes"
) -> None:
    """Drain src_path through the sessionizer once (checkpointed state —
    sessions left open survive into the next invocation)."""
    from .events import EVENTS_SCHEMA

    # one file per microbatch so watermark advancement within a run is
    # deterministic in tests; a production run would raise this
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    q = (
        sessionize(stream, gap=gap)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out_path))
        .start()
    )
    q.awaitTermination()
