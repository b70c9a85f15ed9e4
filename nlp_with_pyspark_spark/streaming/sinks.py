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


def neardup_upsert_batch(
    batch_df: DataFrame,
    store_path: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
    max_docs_per_bucket: int = 1000,
    hash_fn: str = "md5",
) -> None:
    """One near-dup dedup-on-ingest step: check ``batch_df`` against the
    persistent store at ``store_path`` (layout: ``docs/`` surviving
    documents, ``buckets/`` + ``shingles/`` their minhash index — the
    :class:`~..operators.dedup.MinhashIndex` state), keep only documents
    with no near-duplicate among EARLIER survivors or smaller-id batch
    mates, and append the survivors plus their index rows.

    Semantics — dedup-against-survivors, the standard incremental-ingest
    rule: a document is dropped iff its cluster (connected components
    over this batch's delta pairs) contains any already-stored doc, or a
    smaller-id doc of the same batch. Equivalently the store INVARIANT
    is that ``minhash_dedup_pairs`` over the stored docs is always empty
    (pinned in tests/test_streaming.py). Note this is weaker than
    batch-global clustering ONLY on transitive non-clique clusters
    (a~b, b~c, not a~c, arriving in separate batches: batch clustering
    drops b and c; ingest drops b, then KEEPS c — c has no near-dup
    among survivors). For a single batch the two coincide exactly
    (tested).

    Idempotence / crash ordering: replayed batches anti-join against
    the stored doc ids and append nothing. Index rows are appended
    BEFORE docs: a crash between the two re-appends those index rows on
    replay (duplicate index rows are harmless — pair candidates are
    distinct-ed), whereas the docs-first order would leave stored docs
    invisible to future near-dup checks, silently voiding the
    invariant.

    Per-batch cost: the delta path of
    :func:`~..operators.dedup.minhash_delta_pairs` — the store's index
    is scanned keys-only under broadcast semi-join prefilters, never
    shuffled, and the corpus text is never re-read. At 100 TB the
    parquet index scan swaps for the bucketed-table variant
    (``persist_minhash_index``); the decision logic is unchanged.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import (
        MinhashIndex,
        _band_buckets_from_shingles,
        _shingle_sets,
        minhash_delta_pairs,
    )
    from ..operators.graph import connected_components

    spark = batch_df.sparkSession
    docs_path = f"{store_path}/docs"
    fresh = batch_df.dropDuplicates([id_col])
    index = None
    try:
        existing = spark.read.parquet(docs_path).select(id_col)
        fresh = fresh.join(existing, id_col, "left_anti")
        index = MinhashIndex(
            buckets=spark.read.parquet(f"{store_path}/buckets"),
            shingles=spark.read.parquet(f"{store_path}/shingles"),
        )
    except AnalysisException as exc:
        # ONLY a missing store means "first batch" — same contract as
        # incremental_dedup_sink above
        cond = getattr(exc, "getErrorClass", lambda: None)() or str(exc)
        if "PATH_NOT_FOUND" not in cond and "UNABLE_TO_INFER_SCHEMA" not in cond:
            raise
    fresh = fresh.localCheckpoint()
    if fresh.limit(1).count() == 0:
        return
    delta_sh = _shingle_sets(fresh, tokens_col, id_col, n).localCheckpoint()
    delta_bands = _band_buckets_from_shingles(delta_sh, k, bands, hash_fn)
    if index is None:
        # empty index with the right schemas (band_hash type depends on
        # hash_fn) — the first batch then dedups purely within itself
        index = MinhashIndex(buckets=delta_bands.limit(0), shingles=delta_sh.limit(0))
    pairs = minhash_delta_pairs(
        fresh,
        index,
        tokens_col=tokens_col,
        id_col=id_col,
        n=n,
        k=k,
        bands=bands,
        threshold=threshold,
        max_docs_per_bucket=max_docs_per_bucket,
        hash_fn=hash_fn,
    )
    asg = connected_components(pairs, src="doc_a", dst="doc_b").join(
        fresh.select(F.col(id_col).alias("node"), F.lit(1).alias("is_delta")),
        "node",
        "left",
    )
    comp_stats = asg.groupBy("component").agg(
        F.max(F.when(F.col("is_delta").isNull(), 1).otherwise(0)).alias("has_index"),
        F.min(F.when(F.col("is_delta") == 1, F.col("node"))).alias("min_delta"),
    )
    drops = (
        asg.where(F.col("is_delta") == 1)
        .join(comp_stats, "component")
        .where((F.col("has_index") == 1) | (F.col("node") != F.col("min_delta")))
        .select(F.col("node").alias(id_col))
    )
    survivors = fresh.join(drops, id_col, "left_anti").localCheckpoint()
    surv_ids = survivors.select(id_col)
    delta_bands.join(surv_ids, id_col, "left_semi").write.mode("append").parquet(
        f"{store_path}/buckets"
    )
    delta_sh.join(surv_ids, id_col, "left_semi").write.mode("append").parquet(
        f"{store_path}/shingles"
    )
    survivors.write.mode("append").parquet(docs_path)


def neardup_dedup_sink(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint: str,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    **kwargs,
):
    """Streaming near-dup dedup-on-ingest: the minhash extension of
    ``incremental_dedup_sink`` (which dedups exact keys only). Each
    micro-batch runs :func:`neardup_upsert_batch` against the persistent
    store; the store's invariant — no near-dup pair among stored docs —
    survives restarts and has no watermark bound."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        neardup_upsert_batch(
            batch_df,
            store_path,
            tokens_col=tokens_col,
            id_col=id_col,
            threshold=threshold,
            **kwargs,
        )

    q = (
        stream_docs.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
