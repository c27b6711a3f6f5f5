"""Stateful session windows over an event stream — a custom
applyInPandasWithState operator (the Structured Streaming analog of
Solr/streaming-expression sessionization; semantics pinned to the batch
mirror in plans/dataops_queries.py#sessionize_events).

Per user: events ordered by (ts, event_id); an inactivity gap larger than
``gap_us`` closes the running session and starts a new one. A session is
EMITTED when a later event proves the gap, or when the user's state times
out after the event-time watermark passes last_event + gap (so open
sessions flush deterministically as the stream advances).

Scale shape: state is O(active users) with a fixed-size record each
(start, last, count); each micro-batch shuffles only its own events by
user_id (the state store is partition-local). Late events beyond the
watermark are dropped by the engine — the standard streaming contract —
so exact parity with the batch mirror holds for in-watermark data.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_SCHEMA = "user_id long, n_events long, duration_us long, start_us long"
_STATE_SCHEMA = "start_us long, last_us long, n_events long"


def sessionize_stream(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    watermark: str = "30 minutes",
) -> DataFrame:
    """``events`` is a STREAMING DataFrame with (user_id long, event_id
    long, ts timestamp-like). Returns the stream of CLOSED sessions."""
    ev = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    ).withWatermark("ts", watermark)

    def close(user_id: int, start: int, last: int, n: int) -> dict:
        return {
            "user_id": user_id,
            "n_events": n,
            "duration_us": last - start,
            "start_us": start,
        }

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        out: list[dict] = []
        if state.hasTimedOut:
            # watermark passed last+gap: the open session is proven closed
            start, last, n = state.get
            out.append(close(user_id, start, last, n))
            state.remove()
        else:
            parts = [p for p in pdfs if len(p)]
            if parts:
                pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
                pdf = pdf.sort_values(["tus", "event_id"])
                cur = state.get if state.exists else None
                for t in pdf["tus"].to_numpy():
                    t = int(t)
                    if cur is None:
                        cur = (t, t, 1)
                    elif t - cur[1] > gap_us:
                        out.append(close(user_id, *cur))
                        cur = (t, t, 1)
                    else:
                        cur = (cur[0], t, cur[2] + 1)
                state.update(cur)
                # flush when the watermark passes last + gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)
        if out:
            yield pd.DataFrame(out)

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_available(
    spark: Any,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_us: int = SESSION_GAP_US,
) -> None:
    """Drain-and-stop runner: watch a parquet directory of events, write
    closed sessions to a parquet sink. Resumable via the checkpoint (the
    state store carries open sessions across drains)."""
    ev = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    ).parquet(input_dir)
    q = (
        sessionize_stream(ev, gap_us=gap_us)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
