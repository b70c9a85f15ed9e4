"""Token-window chunking and token-budget packing — the two layout
operators between a cleaned corpus and a training run.

``chunk_tokens``: split each document's token list into fixed-size
overlapping windows (context-length chunking). Pure Catalyst — a
``sequence`` of chunk starts exploded against row-local ``slice`` calls,
so the operator is scan-speed and the only row growth is the real output
fan-out (≈ n_tokens / stride rows per doc).

``pack_chunks``: assign documents to token-budget packs (sequence
packing for fixed-token training batches). Greedy packing is inherently
sequential, so the scalable formulation buckets rows deterministically
and packs *within* buckets by running token count: pack boundaries fall
at budget multiples of the bucket's cumulative count. A pack may
overflow by at most one document (the crossing doc joins the earlier
pack) — the standard streaming-packing relaxation; exact bin packing is
NP-hard and needs global order. One shuffle (the bucket window), no
collect, no driver loop; buckets are independent, so 1000 executors
pack 1000 buckets concurrently.

Both operators are engine-independent arithmetic over token counts —
fully DuckDB-oracle-able (window sums cast to BIGINT; see the repo
oracle conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_tokens(
    docs: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    chunk_size: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text) — fixed-size
    token windows with ``overlap`` tokens shared between neighbors.

    stride = chunk_size − overlap; chunk k covers tokens
    [k·stride, k·stride + chunk_size). n_chunks =
    max(1, ⌈(n − overlap) / stride⌉), so every token lands in ≥1 chunk
    and no chunk starts beyond the end. Empty-token docs emit nothing.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    t = F.col(tokens_col)
    n = F.size(t)
    # integer ceil((n-overlap)/stride) via truncation (numerator may be
    # ≤ 0 for short docs — greatest(1, …) pins those to a single chunk)
    n_chunks = F.greatest(
        F.lit(1), ((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    )
    return (
        docs.where(n > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            t.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(F.slice("__toks", F.col("chunk_idx") * stride + 1, chunk_size))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("__toks", F.col("chunk_idx") * stride + 1, chunk_size)).alias(
                "chunk_text"
            ),
        )
    )


def pack_chunks(
    token_counts: DataFrame,
    count_col: str = "ws_tokens",
    id_col: str = "doc_id",
    budget: int = 256,
    n_buckets: int = 8,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(doc_id, bucket, pack_id, n_tokens [, *extra_cols]): token-budget
    pack assignment.

    bucket = pmod(doc_id, n_buckets) — deterministic, engine-neutral
    (hash-based bucketing via :mod:`.sampling`'s families is the drop-in
    when ids are not uniform). Within a bucket, docs are ordered by id
    and a doc's pack is ⌊(cumulative tokens before it) / budget⌋ — a
    single running-sum window per bucket.

    ``extra_cols`` rides payload columns (text, tokens) through the
    window untouched, so a downstream shard writer needs no join back —
    the assignment and the payload share one shuffle.
    """
    extra = list(extra_cols or [])
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        token_counts.select(
            F.col(id_col).alias("doc_id"),
            F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
            F.col(count_col).alias("n_tokens"),
            *extra,
        )
        .select(
            "doc_id",
            "bucket",
            F.floor(cum_before / F.lit(budget)).cast("long").alias("pack_id"),
            "n_tokens",
            *extra,
        )
    )


def pack_and_write_shards(
    docs: DataFrame,
    path: str,
    count_col: str = "ws_tokens",
    id_col: str = "doc_id",
    payload_cols: list[str] | None = None,
    budget: int = 256,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """The "produce training shards" end of the pipeline as one call:
    token-budget pack assignment (:func:`pack_chunks`) chained into a
    shard-addressable partitioned write.

    Layout contract (asserted in tests/test_chunking.py): the output is
    Hive-partitioned ``bucket=<b>/pack_id=<p>/``, and because the rows
    are repartitioned on exactly (bucket, pack_id) before the write,
    every shard directory holds EXACTLY ONE parquet file — a training
    job addresses shard (b, p) as one path, one file, whose rows are the
    pack's documents.

    100 TB shape: the directory count equals the shard count, which any
    shard store must hold anyway — with a production-sized budget (10⁷-
    10⁸ tokens per shard, vs the test-sized default) 100 TB of text is
    ~10⁴-10⁵ shards. Two shuffles total: the per-bucket assignment
    window and the shard repartition; the payload rides both (no join
    back), and each output task writes only the shards it owns.
    """
    payload = list(payload_cols or [])
    packed = pack_chunks(
        docs,
        count_col=count_col,
        id_col=id_col,
        budget=budget,
        n_buckets=n_buckets,
        extra_cols=payload,
    )
    from ..sources.io import write_partitioned

    write_partitioned(
        packed.repartition("bucket", "pack_id"),
        path,
        ["bucket", "pack_id"],
        mode=mode,
    )
