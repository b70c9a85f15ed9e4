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


#: output schema of gap_filled_stream — matches the batch
#: resample_forward_fill columns exactly (stream-vs-batch equality)
GAP_FILL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("bucket_start_epoch", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("is_gap", T.BooleanType()),
    ]
)

_GAP_STATE_SCHEMA = (
    "pend_b array<long>, pend_ts array<long>, pend_id array<long>, "
    "pend_v array<double>, last_b long, last_v double, has_last boolean"
)


def _gap_drain(pend, last, wm_sec, w):
    """Emit every grid row the watermark has sealed, in bucket order.

    ``pend``: sorted [(bucket, ts_ns, event_id, value)] per-bucket last
    observations not yet emitted. ``last``: (bucket, value) of the most
    recently emitted row, or None. A bucket [b, b+w) is sealed once
    ``b + w <= wm_sec`` — no event for it can still arrive. Gap rows
    between the last emitted bucket and the next OBSERVED bucket carry
    the last value; trailing silence after the final observation emits
    NOTHING (the batch grid ends at the key's last observed bucket, and
    the stream cannot know whether a later observation extends it — so
    it waits, exactly preserving batch semantics)."""
    out = []
    while pend:
        b0, _ts0, _id0, v0 = pend[0]
        if last is not None:
            g, stalled = last[0] + w, False
            while g < b0:
                if g + w <= wm_sec:
                    out.append((g, last[1], True))
                    last = (g, last[1])
                    g += w
                else:
                    stalled = True
                    break
            if stalled:
                break
        if b0 + w <= wm_sec:
            out.append((b0, v0, False))
            last = (b0, v0)
            pend.pop(0)
        else:
            break
    return out, pend, last


def _make_gap_fill(width_sec: int, idle_ttl_ms: int):
    w = width_sec

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: F811 (worker-side import)

        if state.exists:
            pb, pts, pid, pv, lb, lv, has_last = state.get
            pend = sorted(zip(pb, pts, pid, pv))
            last = (lb, lv) if has_last else None
        else:
            pend, last = [], None
        if state.hasTimedOut and not pend:
            if last is None:
                # idle past ttl, nothing pending, nothing ever emitted:
                # nothing to preserve — evict outright
                state.remove()
            else:
                # idle past ttl: shed the (empty) pending buffer but
                # RETAIN the LOCF frontier (two scalars). A key that
                # resumes after an event-time silence longer than the
                # ttl must still fill the whole silent span, exactly
                # like the batch twin — if the frontier were evicted
                # the key would restart at last=None and the gap rows
                # for the silent span would silently never be emitted.
                # No new timeout is registered: the frontier-only
                # state costs nothing per trigger and sleeps until the
                # key's next event re-arms the machine.
                state.update(([], [], [], [], last[0], last[1], True))
            return

        new_rows = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_ns = pdf["ts_ns"].astype("int64")
            new_rows.append(
                pd.DataFrame(
                    {
                        "b": (ts_ns // 1_000_000_000) // w * w,
                        "ts": ts_ns,
                        "id": pdf["event_id"].astype("int64"),
                        "v": pdf["value"].astype("float64"),
                    }
                )
            )
        if new_rows:
            allobs = pd.concat(
                [pd.DataFrame({"b": [b for b, *_ in pend],
                               "ts": [t for _, t, *_ in pend],
                               "id": [i for *_, i, _ in pend],
                               "v": [v for *_, v in pend]})]
                + new_rows
            )
            # per-bucket last observation, tie-break (ts_ns, event_id):
            # sort ascending, keep the final row of each bucket
            allobs = allobs.sort_values(["b", "ts", "id"]).drop_duplicates(
                "b", keep="last"
            )
            pend = [
                (int(r.b), int(r.ts), int(r.id), float(r.v))
                for r in allobs.itertuples(index=False)
            ]
            pend.sort()
            if last is not None:
                # anything at or before the emitted frontier arrived
                # beyond the watermark contract; drop (cannot re-emit)
                pend = [p for p in pend if p[0] > last[0]]

        wm_ms = state.getCurrentWatermarkMs()
        out, pend, last = _gap_drain(pend, last, wm_ms // 1000, w)

        state.update(
            (
                [p[0] for p in pend],
                [p[1] for p in pend],
                [p[2] for p in pend],
                [p[3] for p in pend],
                last[0] if last else 0,
                last[1] if last else 0.0,
                last is not None,
            )
        )
        if pend:
            # wake when the next emittable bucket seals (gap frontier if
            # one is owed, else the first pending observation)
            nxt = min(pend[0][0], last[0] + w) if last else pend[0][0]
            state.setTimeoutTimestamp(max((nxt + w) * 1000, wm_ms + 1))
        else:
            # nothing owed: plain idle eviction
            state.setTimeoutTimestamp(wm_ms + idle_ttl_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "bucket_start_epoch": [b for b, _, _ in out],
                    "value": [v for _, v, _ in out],
                    "is_gap": [g for _, _, g in out],
                }
            )

    return update


def gap_filled_stream(
    events: DataFrame,
    width_sec: int = 3600,
    watermark: str = "1 hour",
    idle_ttl_sec: int = 3600,
) -> DataFrame:
    """Streaming twin of ``operators.windows.resample_forward_fill``:
    per-user fixed-grid rows with last-observation-carried-forward,
    emitted as the watermark SEALS each bucket — a custom stateful
    operator (``applyInPandasWithState``, append mode) Spark's built-in
    windowed aggregations cannot express, because a gap row's value
    comes from an arbitrarily older event.

    Equality contract (pinned in tests): drain a finite stream whose
    watermark ends beyond every bucket, and the collected rows equal
    the batch operator's over the same events — same grid, same fill
    values, same (ts_ns, event_id) in-bucket tie-break, and the same
    trailing-silence rule (the grid ends at each key's last observed
    bucket; the stream holds that bucket back until a later observation
    proves the grid extends, so it never emits a row batch wouldn't).

    State per key is the un-sealed observation span only — bounded by
    (watermark delay + max gap)/width rows, not stream length — plus
    one (bucket, value) frontier; sealed rows leave state immediately.
    Keys use event-time timeouts both to flush buckets that seal while
    the key itself is silent (other keys advance the watermark) and to
    shed idle keys after ``idle_ttl_sec``. Idle shedding drops the
    (empty) pending buffer but RETAINS the two-scalar LOCF frontier —
    a key that resumes after a silence longer than the ttl still fills
    the entire silent span, so stream == batch holds across arbitrary
    gaps (pinned in tests); only keys that never emitted a row are
    evicted outright. The frontier residual is (long, double) per
    ever-active key — the same order of state a streaming
    de-duplicator keeps — and frontier-only keys register no timeout,
    so they cost nothing per trigger.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_gap_fill(width_sec, idle_ttl_sec * 1000),
            outputStructType=GAP_FILL_SCHEMA,
            stateStructType=_GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
