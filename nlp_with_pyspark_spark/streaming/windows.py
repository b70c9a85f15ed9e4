"""Structured Streaming operators over the events schema.

The reference has no streaming at all (SURVEY §2.12); this module is
the north-star extension: the same windowed aggregations as
``operators/windows.py`` expressed as streaming plans, so a user can
run the identical query over a live source. The batch versions are the
oracle-checked semantics; tests assert stream-vs-batch agreement by
replaying the static events table through a file stream.

Watermarking: every stateful op bounds its state with
``withWatermark('ts', ...)`` — at 100 TB/day of events, unbounded state
is the first thing that kills a streaming job. Late rows beyond the
watermark are dropped (documented, standard semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import normalize_events


def events_stream_from_dir(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over an events parquet directory.

    ``readStream`` needs the schema up front; rather than hard-coding one
    physical layout (a pinned long-nanos ``ts`` broke every streaming test
    when the testdata flipped to TIMESTAMP(MICROS) in round 4), read it
    from the parquet footers — a metadata-only batch read, no data scan —
    so nanos and micros files both stream. The raw stream is then
    normalized to the canonical (``ts`` timestamp, ``ts_ns`` long) pair
    by the same seam the batch reader uses
    (:func:`..sources.io.normalize_events`): stream and batch plans stay
    bit-identical downstream, which is what the stream-vs-batch equality
    tests assert.

    ``maxFilesPerTrigger`` simulates incremental arrival when replaying
    static testdata; a production deployment swaps this one line for a
    Kafka source — every downstream operator is source-agnostic.
    """
    from pyspark.sql import types as T
    from pyspark.sql.utils import AnalysisException

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # same seam-enforcement as sources/io.read_table: the NTZ cast in
    # normalize_events must not depend on the caller session's timezone
    # (warns instead of silently overwriting a caller-chosen zone)
    from ..sources.io import pin_utc_session

    pin_utc_session(spark)
    try:
        raw_schema = spark.read.parquet(path).schema
    except AnalysisException:
        # consumer-first cold start: no files yet, nothing to infer
        # from — assume the current producer layout (micros timestamp);
        # a nanos producer's first file would need the stream restarted,
        # which the checkpoint makes cheap
        raw_schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return normalize_events(raw)


def tumbling_stream(
    events: DataFrame, width_sec: int = 300, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming tumbling window ≡ operators.windows.tumbling_counts.

    Emits (bucket_start_epoch, event_type, n_events, sum_value) — the
    same shape as the batch/oracle version, so results are directly
    comparable.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_sec} seconds"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_stream(
    events: DataFrame,
    width_sec: int = 600,
    slide_sec: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sliding window ≡ operators.windows.sliding_counts
    (native ``F.window(ts, width, slide)`` — epoch-aligned, so window
    starts match the batch explode formulation exactly)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_sec} seconds", f"{slide_sec} seconds"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows ≡ operators.windows.sessionize, via the
    native ``session_window`` (state-store backed, watermark-bounded)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_sec} seconds"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.expr("ts_ns div 1000000000")).alias("session_start_epoch"),
            F.max(F.expr("ts_ns div 1000000000")).alias("session_end_epoch"),
        )
        .select(
            "user_id", "n_events", "session_start_epoch", "session_end_epoch"
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once event stream by event_id within the watermark window
    (the streaming counterpart of operators.dedup.exact_dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
):
    """Production sink shape: parquet files + checkpointed offsets.

    The checkpoint directory gives exactly-once output across restarts
    (offset log + file-sink manifest); a resumed query continues from
    the last committed batch instead of reprocessing. Append mode
    requires a watermarked aggregation (finalized windows only).
    Blocks until all available input is processed.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a (bounded) stream into an in-memory table; returns the
    query handle after all available data is processed. Test utility."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_dedup_within_watermark(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Dedup for at-least-once sources where RETRIES CARRY A NEW
    TIMESTAMP (producer re-stamps on resend): ``dropDuplicatesWithinWatermark``
    matches on event_id alone and keeps state until the watermark passes
    the FIRST sighting + delay.

    Contrast ``streaming_dedup``: plain ``dropDuplicates([id])`` treats
    (id, ts) rows with different ts as distinct only if ts is in the key;
    with just [event_id] its state never expires without a watermark
    column in the key — this variant is the one whose state is bounded
    AND catches re-stamped duplicates. Spark 3.5+ semantics."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
