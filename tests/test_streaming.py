"""Structured Streaming tests: stream-vs-batch agreement.

Strategy (SURVEY §2.12): the batch windowing operators are the
oracle-checked semantics; here we replay the static events parquet
through a file stream and assert the streaming plans converge to the
same answers once all data is processed (availableNow drain).
"""

import pyspark.sql.functions as F
import pytest

from nlp_with_pyspark_spark.operators.windows import (
    session_stats,
    sessionize,
    tumbling_counts,
)
from nlp_with_pyspark_spark.sources.io import read_table
from nlp_with_pyspark_spark.streaming.stateful import user_running_stats
from nlp_with_pyspark_spark.streaming.windows import (
    events_stream_from_dir,
    run_to_memory,
    sessionized_stream,
    sliding_stream,
    streaming_dedup,
    tumbling_stream,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return read_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, tmp_path_factory):
    # the file-stream source wants a directory; testdata ships a single
    # parquet file, so stage it behind a symlink
    d = tmp_path_factory.mktemp("events_stream_src")
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    # all files in one trigger: availableNow still runs the full
    # streaming machinery (state store, watermark advance, commit log)
    return events_stream_from_dir(spark, str(d), max_files_per_trigger=16)


def _rows(spark, name):
    return {tuple(r) for r in spark.table(name).collect()}


def test_tumbling_stream_matches_batch(spark, events_batch, events_stream):
    q = run_to_memory(tumbling_stream(events_stream, width_sec=300), "t_tumbling")
    try:
        got = _rows(spark, "t_tumbling")
        want = {
            tuple(r)
            for r in tumbling_counts(events_batch, width_sec=300)
            .select("bucket_start_epoch", "event_type", "n_events", "sum_value")
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_sliding_stream_matches_batch(spark, events_batch, events_stream):
    from nlp_with_pyspark_spark.operators.windows import sliding_counts

    q = run_to_memory(sliding_stream(events_stream, width_sec=600, slide_sec=300), "t_sliding")
    try:
        got = _rows(spark, "t_sliding")
        want = {
            tuple(r)
            for r in sliding_counts(events_batch, width_sec=600, slide_sec=300)
            .select("window_start_epoch", "event_type", "n_events", "sum_value")
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_lemmatize_udf_fallback(spark, sf_dir):
    """F4/F6 pandas_udf plumbing: deterministic ASCII-fold fallback when
    nltk is absent (this container), schema array<string>."""
    from nlp_with_pyspark_spark.functions.text import lemmatize_udf, tokens_pipeline
    from nlp_with_pyspark_spark.sources.io import read_table

    docs = (
        read_table(spark, sf_dir, "documents")
        .limit(50)
        .withColumn("tokens", tokens_pipeline(F.col("text")))
        .withColumn("lemmas", lemmatize_udf()(F.col("tokens")))
    )
    rows = docs.select("tokens", "lemmas").collect()
    assert rows and all(len(r.lemmas) == len(r.tokens) for r in rows)
    assert all(all(c.isascii() for w in r.lemmas for c in w) for r in rows)


def test_session_stream_matches_batch(spark, events_batch, events_stream):
    q = run_to_memory(sessionized_stream(events_stream, gap_sec=1800), "t_sessions")
    try:
        got = _rows(spark, "t_sessions")
        want = {
            tuple(r)
            for r in sessionize(events_batch, gap_sec=1800)
            .select("user_id", "n_events", "session_start_epoch", "session_end_epoch")
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_streaming_dedup_drops_dupes(spark, events_stream, events_batch):
    q = run_to_memory(
        streaming_dedup(events_stream).select("event_id"), "t_dedup", output_mode="append"
    )
    try:
        n_stream = spark.table("t_dedup").count()
        n_distinct = events_batch.select("event_id").distinct().count()
        assert n_stream == n_distinct
    finally:
        q.stop()


def test_parquet_sink_checkpointed(spark, events_batch, sf_dir, tmp_path):
    """File-sink path: watermarked tumbling agg → checkpointed parquet in
    append mode. Finalized windows (everything before max_ts - watermark)
    must match the batch answer for those buckets; a restart with the
    same checkpoint must add NO duplicate rows (exactly-once)."""
    from nlp_with_pyspark_spark.streaming.windows import stream_to_parquet

    d = tmp_path / "src"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        s = events_stream_from_dir(spark, str(d), max_files_per_trigger=16)
        q = stream_to_parquet(
            tumbling_stream(s, width_sec=300, watermark="10 minutes"), out, ckpt
        )
        q.stop()

    run()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = tumbling_counts(events_batch, width_sec=300).select(
        "bucket_start_epoch", "event_type", "n_events", "sum_value"
    )
    # append mode emits only windows finalized by the watermark
    max_sec = events_batch.agg(F.max(F.expr("ts_ns div 1000000000"))).first()[0]
    finalized = {
        tuple(r)
        for r in batch.where(F.col("bucket_start_epoch") + 300 <= max_sec - 600).collect()
    }
    assert finalized <= got, "sink is missing finalized windows"
    n_first = len(got)

    run()  # resume from the same checkpoint: no new input ⇒ no new rows
    assert spark.read.parquet(out).count() == n_first


def test_stateful_running_stats_converges(spark, events_stream, events_batch):
    """applyInPandasWithState: after draining the whole table, the last
    update per user must equal the batch groupBy fold."""
    q = run_to_memory(user_running_stats(events_stream), "t_state", output_mode="update")
    try:
        # update mode emits one row per user per micro-batch; with a
        # single availableNow drain the final (and only) row is the total
        got = {
            (r.user_id, r.n_events, round(r.sum_value, 6), r.max_value)
            for r in spark.table("t_state")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("sum_value").alias("sum_value"),
                F.max("max_value").alias("max_value"),
            )
            .collect()
        }
        want = {
            (r.user_id, r.n_events, round(r.sum_value, 6), r.max_value)
            for r in events_batch.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
                F.max("value").alias("max_value"),
            )
            .collect()
        }
        assert got == want
    finally:
        q.stop()
