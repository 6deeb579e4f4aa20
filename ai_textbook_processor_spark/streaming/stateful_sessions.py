"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (SURVEY §2.11; the task brief's named mechanism
for stateful ops Spark's built-ins can't express).

Batch sessionization (harness ``ev_sessionize``) is a window + cumulative
sum; on an unbounded stream the same semantics need per-key state that
survives micro-batches: one open session per user, closed either by an
in-batch gap (> ``gap_minutes`` between consecutive events) or by an
event-time timeout once the watermark passes ``last_event + gap`` (so an
idle user's final session still closes exactly once).

Scale shape: state is hash-partitioned by user_id (one shuffle, the same
key a cluster would bucket the Kafka topic by), state size is O(1) per
user (3 longs), and emission is append-mode — closed sessions are
immutable facts, safe to sink to the catalog with idempotent commits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _closed(user_id: int, start_ms: int, last_ms: int, n: int) -> dict:
    return {
        "user_id": user_id,
        "session_start_ms": start_ms,
        "session_end_ms": last_ms,
        "n_events": n,
    }


def make_sessionizer(gap_ms: int):
    """Returns the applyInPandasWithState function: emits CLOSED sessions,
    keeps the open one in state, arms an event-time timeout at
    last_event + gap."""

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        cols = [f.name for f in SESSION_SCHEMA.fields]

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [_closed(user_id, start_ms, last_ms, n)], columns=cols
            )
            return

        ts = sorted(
            int(t) for pdf in pdfs for t in pdf["ts_ms"] if t is not None
        )
        if not ts:
            yield pd.DataFrame([], columns=cols)
            return

        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = ts[0], ts[0], 0

        out = []
        for t in ts:
            if t - last_ms > gap_ms:
                out.append(_closed(user_id, start_ms, last_ms, n))
                start_ms, n = t, 0
            last_ms = t
            n += 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(out, columns=cols)

    return sessionize


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp).
    Returns the append-mode stream of closed sessions."""
    gap_ms = gap_minutes * 60_000
    prepared = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id", "ts",
            (F.col("ts").cast("double") * 1000).cast("long").alias("ts_ms"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
