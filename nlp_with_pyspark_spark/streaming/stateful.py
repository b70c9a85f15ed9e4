"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming or stateful processing (SURVEY §2.12);
this is the north-star extension for operators that the built-in
windowed aggregations cannot express: arbitrary per-key state machines
(running counters, anomaly detectors, cross-event feature trackers).

Scale notes: state lives in Spark's per-partition state store keyed by
the groupBy key, so memory is bounded by (#active keys per partition ×
state size), not stream length. Event-time timeouts evict idle keys —
mandatory at 100 TB/day, where "user ids ever seen" is unbounded but
"users active within the watermark" is not: ``user_running_stats``
registers an ``EventTimeTimeout`` at (key's last event time +
``idle_ttl``); once the watermark passes it, the timed-out callback
drops the state (tests/test_streaming.py proves a re-appearing key
restarts from zero).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema of user_running_stats
RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n_events long, sum_value double, max_value double"


def _make_update_user_stats(idle_ttl_ms: int | None):
    """Build the per-key state machine. ``idle_ttl_ms=None`` disables
    eviction (NoTimeout plumbing kept for tests/back-compat)."""

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user running (count, sum, max) over the value column.

        Emits one updated row per user per micro-batch. The same fold a
        batch groupBy computes once, maintained incrementally — the
        point is the state plumbing, which generalizes to any per-key
        machine.
        """
        if state.hasTimedOut:
            # watermark passed last-activity + ttl. The last update
            # already emitted the final fold, so emit nothing — just
            # drop the state; a later event for this key starts fresh.
            state.remove()
            return
        if state.exists:
            n, s, mx = state.get
        else:
            n, s, mx = 0, 0.0, float("-inf")
        last_event_ms = None
        for pdf in pdfs:
            v = pdf["value"].astype("float64")
            n += len(pdf)
            s += float(v.sum())
            if len(pdf):
                mx = max(mx, float(v.max()))
                batch_max_ms = int(pdf["ts"].max().value // 1_000_000)
                last_event_ms = (
                    batch_max_ms
                    if last_event_ms is None
                    else max(last_event_ms, batch_max_ms)
                )
        state.update((n, s, mx))
        if idle_ttl_ms is not None and last_event_ms is not None:
            # idle = no events within ttl of the key's LAST event. Spark
            # requires the timeout timestamp to sit beyond the current
            # watermark — a key whose whole ttl is already below the
            # watermark gets the minimum legal horizon (evicted at the
            # next watermark advance).
            state.setTimeoutTimestamp(
                max(last_event_ms + idle_ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [mx],
            }
        )

    return update


def user_running_stats(
    events: DataFrame, watermark: str = "1 hour", idle_ttl_sec: int | None = 3600
) -> DataFrame:
    """Streaming per-user running stats with bounded state.

    ``events`` must be a streaming DataFrame with an event-time ``ts``
    timestamp column (streaming/windows.py:events_stream_from_dir).
    Keys idle for ``idle_ttl_sec`` of event time are evicted from the
    state store once the watermark passes (pass ``None`` to keep state
    forever — only sane for bounded key domains).
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_ttl_sec is None
        else GroupStateTimeout.EventTimeTimeout
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user_stats(
                None if idle_ttl_sec is None else idle_ttl_sec * 1000
            ),
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
