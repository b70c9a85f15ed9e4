"""Event-time windowing over the ``events`` table — batch formulations.

The reference has no temporal operators at all (SURVEY §2.12); these are
the batch-first versions of the Structured Streaming windows in
``streaming/`` (same semantics, oracle-checkable). Buckets are epoch-
second floors so the DuckDB oracle agrees bit-for-bit.

Precision note: events.ts is nanosecond-resolution, and nanos-since-epoch
(~1.7e18) exceed double's 53-bit mantissa — so every second/bucket
derivation uses *integer* arithmetic on the exact ``ts_ns`` long
(``div``), never float division. The oracle mirrors with DuckDB's
``epoch_ns(ts) // 1000000000``.

Scale notes: tumbling/sliding aggs shuffle once on (bucket, key) with
map-side partials. Sessionization is the classic gaps-and-islands — one
shuffle on user_id for the lag/cumsum window, then a hash agg; this is
how Spark's own ``session_window`` executes, but spelled out so the
oracle can check it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .relational import money_sum

def _epoch_sec() -> Column:
    """Exact epoch seconds from the long-nanos column (floor; ts ≥ 0)."""
    return F.expr("ts_ns div 1000000000")


def _bucket(sec: Column, width_sec: int) -> Column:
    # integer floor-div then re-scale: bucket start in epoch seconds
    return (sec - (sec % width_sec)).cast("long")


def resample_forward_fill(
    events: DataFrame,
    width_sec: int = 3600,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Resample an irregular event series onto a fixed per-key grid with
    forward fill — the time-series densification Spark has no native
    operator for: ``(key, bucket_start_epoch, value, is_gap)`` with one
    row per ``width_sec`` bucket from each key's first observed bucket
    to its last, ``value`` = the key's most recent in-bucket observation
    at or before that bucket (last-observation-carried-forward), and
    ``is_gap`` marking rows whose bucket had no event.

    Per-bucket "last" is made deterministic by the (ts_ns, id) order —
    two events in one bucket resolve by timestamp then id, never by
    partition layout. The value rides through untouched (no float
    arithmetic), so the output is exactly a stored input value.

    Scale shape — ONE shuffle for the whole plan (plan-tested): the
    input is repartitioned by key up front; the in-bucket rank window
    ((key, bucket) — a key-subset partitioning satisfies it, and Spark
    rewrites the rank-1 filter into a WindowGroupLimit so only one row
    per bucket survives the sort) and the ``lead`` window (key) both
    reuse that layout. Densification is then RUN-LENGTH EXPANSION, not
    a grid join: each observation knows the next observed bucket via
    ``lead`` and explodes its own gap run ``[b, next)`` with its value
    carried — the naive build-a-grid-and-left-join formulation costs
    two more shuffles (the grid⋈agg join re-partitions both sides on
    the full (key, bucket) pair and re-computes the agg subtree) for
    identical output. The expansion is ``sequence`` + ``explode`` —
    distributed, no driver loop. Output size is Σ_key span/width; the
    caller picks ``width_sec`` to keep that sane, as with any resample.
    """
    sec = _epoch_sec()
    b = _bucket(sec, width_sec)
    keyed = events.select(
        F.col(key_col).alias("__key"),
        b.alias("__b"),
        F.col("ts_ns").alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
    ).repartition(F.col("__key"))
    rn = F.row_number().over(
        Window.partitionBy("__key", "__b").orderBy(
            F.desc("__ts"), F.desc("__id")
        )
    )
    agg = keyed.withColumn("__rn", rn).where(F.col("__rn") == 1).select(
        "__key", "__b", "__v"
    )
    nxt = F.lead("__b").over(Window.partitionBy("__key").orderBy("__b"))
    run_end = F.coalesce(nxt - F.lit(width_sec), F.col("__b"))
    expanded = agg.withColumn("__end", run_end).select(
        "__key",
        "__b",
        "__v",
        F.explode(
            F.sequence(F.col("__b"), F.col("__end"), F.lit(width_sec).cast("long"))
        ).alias("__bb"),
    )
    return expanded.select(
        F.col("__key").alias(key_col),
        F.col("__bb").alias("bucket_start_epoch"),
        F.col("__v").alias(value_col),
        (F.col("__bb") != F.col("__b")).alias("is_gap"),
    )


def tumbling_counts(events: DataFrame, width_sec: int = 300) -> DataFrame:
    """Tumbling window: per (bucket, event_type) count + value sum."""
    return (
        events.groupBy(
            _bucket(_epoch_sec(), width_sec).alias("bucket_start_epoch"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value", "sum_value"),
        )
    )


def sliding_counts(events: DataFrame, width_sec: int = 600, slide_sec: int = 300) -> DataFrame:
    """Sliding window via explode of the covering bucket sequence.

    An event at t belongs to every aligned window start in (t-width, t]
    (strict lower bound: start + width > t), emitted with ``sequence`` +
    ``explode`` (F12) — the native shape that avoids re-scanning the
    input once per window offset.
    """
    assert width_sec % slide_sec == 0, "width must be a multiple of slide"
    sec = _epoch_sec()
    low = sec - width_sec  # exclusive
    first_aligned = ((low - (low % slide_sec)) + slide_sec).cast("long")
    last_aligned = (sec - (sec % slide_sec)).cast("long")
    starts = F.sequence(first_aligned, last_aligned, F.lit(slide_sec).cast("long"))
    return (
        events.select(
            F.col("event_type"), F.col("value"), F.explode(starts).alias("window_start_epoch")
        )
        .groupBy("window_start_epoch", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), money_sum("value", "sum_value"))
    )


def sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Session windows per user (gap-based): one row per session.

    gaps-and-islands: lag(sec) over (user, ts_ns-order) → new-session
    flag → running sum = session id → agg. Ordering on the exact ns
    value (+ event_id tie-break) keeps session assignment deterministic
    and engine-independent.
    """
    order = [F.col("ts_ns").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    sec = _epoch_sec()
    prev = F.lag(sec).over(w)
    new_sess = F.when(prev.isNull() | ((sec - prev) > gap_sec), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("_sec", sec)
        .withColumn("session_id", sess_id)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_sec").alias("session_start_epoch"),
            F.max("_sec").alias("session_end_epoch"),
        )
    )


def session_stats(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Per-user session summary — oracle-friendly rollup of sessionize."""
    s = sessionize(events, gap_sec)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max(F.col("session_end_epoch") - F.col("session_start_epoch")).alias(
            "longest_session_sec"
        ),
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "sec",
    start_col: str = "start_sec",
    end_col: str = "end_sec",
    bucket_sec: int = 3600,
) -> DataFrame:
    """Interval ⋈ point range join with NO equi key — every (interval,
    point) pair with ``start <= ts <= end`` — without the
    BroadcastNestedLoopJoin Spark would otherwise plan for a pure
    non-equi condition.

    The scale shape: points get ONE bucket row (``ts div bucket_sec``);
    intervals explode across every bucket they span; the join is then a
    plain equi shuffle join on the bucket, with the exact range
    predicate as a post-filter. A pair can only meet in the point's own
    bucket, so each qualifying pair appears EXACTLY once — no distinct
    needed. Cost: |points| + Σ span_buckets(interval) rows through one
    hash join instead of |points|·|intervals| comparisons.

    ``bucket_sec`` trades explode factor (long intervals → many rows)
    against bucket width (hot buckets when everything lands together);
    set it near the median interval length. Timestamps must be
    non-negative integer seconds (``div`` truncation).
    """
    p = points.withColumn("_bucket", F.expr(f"{ts_col} div {bucket_sec}"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_sec}"),
                F.expr(f"{end_col} div {bucket_sec}"),
            )
        ),
    )
    return (
        iv.join(p, "_bucket")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bucket")
    )


def asof_join_events(
    events: DataFrame, left_type: str = "purchase", right_type: str = "click"
) -> DataFrame:
    """Event-time AS-OF join (absent in both the reference and Spark's
    API): each ``left_type`` event matched to the same user's most recent
    ``right_type`` event at-or-before it.

    Spark-first shape: instead of a range join (which Spark would plan as
    a broadcast-nested-loop), union the two streams and carry the last
    right-side timestamp forward with one ranking window — a single
    shuffle on user_id, linear work, the gaps-and-islands idiom. This is
    how as-of joins scale: both sides hash-partition by key once.

    Tie semantics: a right event at exactly the left ts matches (ordered
    before it via the kind column); total order pinned by event_id.
    """
    e = events.where(F.col("event_type").isin([left_type, right_type])).withColumn(
        "kind", F.when(F.col("event_type") == right_type, 0).otherwise(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_ns").asc(), F.col("kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    right_ns = F.when(F.col("kind") == 0, F.col("ts_ns"))
    return (
        e.withColumn("match_ns", F.last(right_ns, ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr("ts_ns div 1000000000").alias("left_sec"),
            F.expr("match_ns div 1000000000").alias("right_sec"),
            F.expr("(ts_ns - match_ns) div 1000000000").alias("gap_sec"),
        )
    )


def json_props_stats(events: DataFrame) -> DataFrame:
    """``get_json_object`` on events.props (the driver's JSON column) →
    per-event-type stats of the extracted field (SURVEY §2.8 'absent:
    JSON functions' gap)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
