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


def fuzzy_benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.2,
    hash_fn: str = "md5",
    materialize: bool = True,
) -> DataFrame:
    """Fuzzy (MinHash-LSH) decontamination: corpus docs that are
    whole-document near-duplicates of a benchmark doc.

    Complement of :func:`benchmark_overlap`, per the published two-sided
    recipe (exact n-gram collision + fuzzy near-dup, e.g. Llama/Dolma
    corpus hygiene): the exact pass catches a benchmark question QUOTED
    inside a long training doc (high containment, tiny Jaccard — LSH
    can't see it); this pass catches paraphrase-level whole-doc overlap
    (high Jaccard) that the containment score under-ranks when the
    benchmark doc is long. Returns (doc_id, bench_id, jaccard) with
    jaccard ≥ ``threshold``, LSH-blocked exactly like
    ``minhash_dedup_pairs`` (same signature family, same banding).

    Plan shape at scale — ASYMMETRIC by design, unlike the symmetric
    self-join pair path: the benchmark side is O(10k) docs against a
    100 TB corpus, so its band keys AND its shingle sets ride
    broadcasts, and the corpus is scanned twice but NEVER shuffled:

      1. candidate pass — corpus shingles → signatures → band keys,
         hash-joined against the broadcast benchmark band keys; the
         only Exchange is the distinct on (doc_id, bench_id) collision
         pairs, bounded by collisions, not corpus size. No bucket
         grouping and no ``max_docs_per_bucket`` cap: a hot benchmark
         band key inflates only collision ROWS through a streaming
         broadcast join, never a collect_list buffer, and the verify
         prunes false positives exactly.
      2. verify pass — the corpus is re-scanned under a broadcast
         semi-join on the candidate doc ids (re-deriving shingles for
         just those docs is cheaper at scale than materializing
         corpus-wide shingle sets across passes), then exact Jaccard
         against the broadcast benchmark shingle sets.

    ``materialize=False`` skips the two localCheckpoints (benchmark
    shingles, candidates) so the whole lineage stays in one inspectable
    plan — the hook tests/test_corpus_hygiene.py uses to assert the
    corpus side crosses zero Exchanges; production keeps the default.
    """
    from .dedup import _band_buckets_from_shingles, _shingle_sets

    b_sh = _shingle_sets(benchmark, tokens_col, id_col, n)
    if materialize:
        # tiny, consumed twice (band keys + verify) — materialize once
        b_sh = b_sh.localCheckpoint()
    b_bands = _band_buckets_from_shingles(b_sh, k, bands, hash_fn).select(
        F.col("doc_id").alias("bench_id"), "band_id", "band_hash"
    )
    c_bands = _band_buckets_from_shingles(
        _shingle_sets(corpus, tokens_col, id_col, n), k, bands, hash_fn
    )
    cands = (
        c_bands.join(F.broadcast(b_bands), ["band_id", "band_hash"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    if materialize:
        # candidates feed the needed-ids filter AND the verify join
        cands = cands.localCheckpoint()
    needed = cands.select("doc_id").distinct().withColumnRenamed("doc_id", id_col)
    c_verify = _shingle_sets(
        corpus.join(F.broadcast(needed), id_col, "left_semi"), tokens_col, id_col, n
    )
    b_verify = b_sh.select(
        F.col("doc_id").alias("bench_id"), F.col("shingles").alias("b_shingles")
    )
    # candidate pairs are O(collisions) — broadcast them over the
    # prefiltered corpus verify scan so no corpus row ever shuffles
    joined = c_verify.join(F.broadcast(cands), "doc_id").join(
        F.broadcast(b_verify), "bench_id"
    )
    inter = F.size(F.array_intersect("shingles", "b_shingles")).cast("double")
    union = (F.size("shingles") + F.size("b_shingles")).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select(
        "doc_id", "bench_id", F.round(jac, 8).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def decontaminated_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 3,
    exact_threshold: float = 0.2,
    fuzzy_threshold: float | None = 0.5,
    k: int = 12,
    bands: int = 4,
    hash_fn: str = "md5",
    max_docs_per_shingle: int = 1000,
) -> DataFrame:
    """The APPLY step of decontamination — corpus minus every doc
    flagged by :func:`benchmark_overlap` (exact n-gram containment ≥
    ``exact_threshold``) or :func:`fuzzy_benchmark_overlap` (whole-doc
    Jaccard ≥ ``fuzzy_threshold``; pass ``None`` to skip the fuzzy
    pass). What :func:`~..operators.dedup.canonical_corpus` is to the
    dedup pair list, this is to the contamination audit lists: the
    audit queries stay the inspection surface, this emits the training
    corpus.

    Scale/streaming notes: the drop list is id-only and broadcast into
    a LEFT ANTI (flagged docs ≪ corpus); both flag passes consume the
    benchmark through broadcasts, so the whole gate adds zero corpus
    shuffles. The operator is STATELESS in the corpus — batch docs are
    judged only against the fixed benchmark, never against each other —
    so applying it per micro-batch inside ``foreachBatch`` (before
    ``streaming.sinks.neardup_upsert_batch``) is exactly equivalent to
    one batch run over the union of the batches (tested).
    """
    flagged = benchmark_overlap(
        corpus,
        benchmark,
        n=n,
        threshold=exact_threshold,
        tokens_col=tokens_col,
        id_col=id_col,
        max_docs_per_shingle=max_docs_per_shingle,
    ).select("doc_id")
    if fuzzy_threshold is not None:
        flagged = flagged.unionByName(
            fuzzy_benchmark_overlap(
                corpus,
                benchmark,
                tokens_col=tokens_col,
                id_col=id_col,
                n=n,
                k=k,
                bands=bands,
                threshold=fuzzy_threshold,
                hash_fn=hash_fn,
            ).select("doc_id")
        )
    drop = flagged.distinct().withColumnRenamed("doc_id", id_col)
    return corpus.join(F.broadcast(drop), id_col, "left_anti")
