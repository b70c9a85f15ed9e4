"""Streaming sinks beyond the plain file sink (streaming/windows.py:
stream_to_parquet): ``foreachBatch`` patterns for sinks Spark has no
native writer for.

``foreachBatch`` hands each micro-batch to arbitrary batch code. Its
delivery guarantee is AT-LEAST-ONCE — a retried batch re-runs the
function with the same ``batch_id`` — so the function itself must be
idempotent. The incremental-dedup sink below gets idempotence for free
from its anti-join (a replayed batch finds its keys already in the
store and appends nothing), which is exactly why dedup-on-ingest is the
canonical foreachBatch example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.utils import AnalysisException


def incremental_dedup_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: tuple[str, ...] = ("event_id",),
):
    """Continuously ingest a stream into a parquet store, keeping only
    the FIRST occurrence of each key — streaming exact dedup with a
    persistent, queryable output (the batch counterpart is
    operators/dedup.exact_dedup).

    Per micro-batch: drop in-batch duplicates, anti-join the batch
    against the store's existing keys (a key-only column scan — the
    store read never loads payloads), append the survivors. Replayed
    batches are no-ops (idempotent under foreachBatch's at-least-once
    contract).

    Scale notes: the per-batch cost is one key-column scan of the store,
    which grows with the store. That is the honest trade of a plain
    parquet store; at 100 TB the same function body swaps the anti-join
    + append for a transactional MERGE into a key-bucketed table (or a
    key Bloom filter index) — the streaming plumbing (checkpoint,
    batch_id, idempotence) is identical, which is what this operator
    demonstrates. Unlike ``dropDuplicates`` state, the store survives
    restarts with NO watermark bound: dedup is against all history, not
    a time window.
    """
    keys = list(key_cols)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(keys)
        try:
            existing = spark.read.parquet(path).select(*keys)
            fresh = fresh.join(existing, keys, "left_anti")
        except AnalysisException as exc:
            # ONLY a missing store means "first batch". Any other
            # analysis error (key column absent from an existing store,
            # corrupt footer) must fail the batch — treating it as
            # first-batch would skip the anti-join and append duplicates
            # silently, voiding the sink's one guarantee.
            cond = getattr(exc, "getErrorClass", lambda: None)() or str(exc)
            if "PATH_NOT_FOUND" not in cond and "UNABLE_TO_INFER_SCHEMA" not in cond:
                raise
        fresh.write.mode("append").parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
