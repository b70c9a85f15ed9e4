"""Test-set decontamination — benchmark n-gram overlap detection.

A training corpus must not contain the evaluation benchmarks it will be
graded on; the published recipe (GPT-3 appendix C, PaLM §8, Llama) is
n-gram collision between each training document and every benchmark
document. Absent from the reference (which has no corpus-hygiene ops at
all); built Spark-first here:

  * shingle both sides into distinct word n-grams (the same
    ``word_shingles`` the dedup family uses);
  * invert the BENCHMARK side only and broadcast it — eval sets are
    O(10k) docs against a 100 TB corpus, so the corpus-side scan joins
    against a broadcast hash map and never shuffles its shingles;
  * count collisions per (corpus doc, benchmark doc) and flag docs whose
    overlap covers ≥ ``threshold`` of the benchmark document.

The output is the drop/audit list: (doc_id, bench_id, n_common,
contamination) where contamination = |common shingles| / |benchmark
shingles| — asymmetric on purpose: a benchmark question fully contained
in a long training document is 100% contaminated even though the
document's own Jaccard against it is tiny.

Scale notes: the only shuffle is the groupBy on (doc_id, bench_id),
bounded by actual collisions, not corpus size. The benchmark inverted
index rides the broadcast; a hot shingle (stop-phrase) inflates only
collision rows, and the ``max_docs_per_shingle`` frequency cut on the
benchmark side caps that the same way the dedup inverted index does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _shingle_sets


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_docs_per_shingle: int = 1000,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, bench_id, n_common, contamination) for corpus docs whose
    shingle overlap covers ≥ ``threshold`` of a benchmark doc's shingles.

    Both inputs need a ``tokens_col`` array column (tokenize upstream
    once — the corpus side is typically already tokenized for dedup).

    ``corpus_shingles``: optional pre-computed (doc_id, shingles) table
    with ``_shingle_sets(corpus, tokens_col, id_col, n)`` semantics —
    when a dedup stage in the same pipeline already materialized the
    corpus shingles, pass them here and this operator reuses that scan
    instead of re-deriving from text (operators/pipeline.corpus_funnel).
    """
    # The corpus side streams — no materialization barrier: shingle
    # arrays are flet-bound inside word_shingles (functions/expr.py), so
    # the explode evaluates the tokenize+shingle pipeline once per row,
    # and at 100 TB the corpus never hits disk. The BENCH side is
    # checkpointed: it is tiny, consumed twice (sizes + inverted index),
    # and the barrier stops the double shingle computation.
    c_sets = (
        corpus_shingles
        if corpus_shingles is not None
        else _shingle_sets(corpus, tokens_col, id_col, n)
    )
    c_inv = c_sets.select("doc_id", F.explode("shingles").alias("shingle"))
    b_sets = (
        _shingle_sets(benchmark, tokens_col, id_col, n)
        .localCheckpoint()
        .select(
            F.col("doc_id").alias("bench_id"),
            F.col("shingles").alias("b_shingles"),
        )
    )
    b_sizes = b_sets.select("bench_id", F.size("b_shingles").alias("n_bench"))
    b_inv = b_sets.select("bench_id", F.explode("b_shingles").alias("shingle"))
    # stop-phrase guard on the benchmark index (mirrors the dedup
    # inverted-index frequency cut)
    b_inv = (
        b_inv.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .where(F.col("_df") <= max_docs_per_shingle)
        .drop("_df")
    )
    common = (
        c_inv.join(F.broadcast(b_inv), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(F.broadcast(b_sizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common").cast("double") / F.col("n_bench").cast("double"), 8
            ).alias("contamination"),
        )
        .where(F.col("contamination") >= threshold)
    )
