"""Stream-stream joins — the join family member batch can't stand in for.

The batch engine covers equi/semi/anti/broadcast/salted joins, the
as-of join (operators/windows.asof_join_events) and the bucketed range
join. The streaming counterpart is the *interval join*: two live
streams joined on a key plus a time-range predicate. Spark can run this
with bounded state only because BOTH sides are watermarked and the
range condition upper- AND lower-bounds the event-time gap — the state
store evicts a row once the other side's watermark passes its last
possible match (the published Structured Streaming state-cleanup rule).
Omit either bound and state grows forever at 100 TB/day; this module
makes both mandatory.

Semantics: inner join, all pairs with
``0 ≤ right.ts − left.ts ≤ max_gap`` on equal keys — attribution-style
"every purchase within N minutes of a click". (The batch as-of join
keeps only the *nearest* match; the interval join keeps all, which is
the join Spark's streaming engine supports without a custom stateful
operator.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap_sec: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """(left_id, right_id, key, gap_sec): all right events within
    ``max_gap_sec`` after a left event with the same key.

    Works identically on streaming and batch DataFrames (withWatermark
    is a no-op on batch) — tests replay the same call both ways and
    assert equality. Output ids are the sides' ``event_id`` columns;
    gap is whole seconds (`long`) floored from the microsecond
    timestamps — non-negative by the join condition, so truncation and
    floor agree and the DuckDB oracle can mirror it exactly.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    # cast: unix_micros requires TimestampType and rejects timestamp_ntz;
    # the UTC session tz makes the cast value-preserving for either input
    lts = F.col(f"l.{ts_col}").cast("timestamp")
    rts = F.col(f"r.{ts_col}").cast("timestamp")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col(f"l.{key}").alias(key),
        ((F.unix_micros(rts) - F.unix_micros(lts)) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_sec"),
    )


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap_sec: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER interval join: every left event, with its matching
    right events where they exist and NULL ``right_id``/``gap_sec``
    where they don't — "which clicks converted, and which didn't", the
    question the inner join can't answer.

    Streaming semantics (the published state-cleanup rule again): an
    unmatched left row is emitted with NULLs only once the watermark
    passes its last possible match time (left.ts + max_gap), because
    until then a matching right event could still arrive. Both
    watermarks and both range bounds are therefore mandatory, exactly as
    in :func:`interval_join_streams`. On a batch DataFrame the same call
    degrades to a plain left outer join (withWatermark is a no-op) —
    tests replay both and assert agreement.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    lts = F.col(f"l.{ts_col}").cast("timestamp")
    rts = F.col(f"r.{ts_col}").cast("timestamp")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
    )
    return l.join(r, cond, "leftOuter").select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col(f"l.{key}").alias(key),
        ((F.unix_micros(rts) - F.unix_micros(lts)) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_sec"),
    )


def click_purchase_attribution(events: DataFrame, max_gap_sec: int = 300) -> DataFrame:
    """Attribution pairs: purchases within ``max_gap_sec`` of a click by
    the same user. One call serves the streaming plan (pass the events
    stream) and the batch oracle (pass the static table)."""
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase")
    return interval_join_streams(clicks, purchases, max_gap_sec=max_gap_sec)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment: every event gains its dimension row
    (LEFT join — events with no dimension entry pass through with
    NULLs, they must not be silently dropped by an ingest pipeline).

    The stateless join family member: no watermark and no state store,
    because the static side is complete — each micro-batch joins
    against it directly. ``broadcast_dim=True`` pins the hash-map plan
    (a dimension that fits in memory should never shuffle the stream);
    at 100 TB/day the stream side stays unshuffled either way, and a
    too-big-to-broadcast dimension degrades to a shuffled join of the
    micro-batch only. For a dimension that CHANGES mid-stream, snapshot
    semantics depend on the source (plain parquet is read once at plan
    time) — re-plan per batch via foreachBatch when freshness matters;
    this helper deliberately keeps the simple, documented contract.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, "left")
