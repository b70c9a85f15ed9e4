"""Full-text retrieval: BM25 scoring and top-k search over the corpus.

The engine already builds the two statistics BM25 needs — per-(doc,
term) frequency and document frequency (operators/features.py computes
their presence-TF / unsmoothed-IDF cousins for the reference's TF-IDF
path, `utils/prep_rdd.py:42-78`). BM25 is the retrieval-grade weighting
of the same tables: Robertson–Spärck Jones IDF with the standard
+1 floor (the Lucene/Okapi practical form, non-negative for any df)
and term-frequency saturation with document-length normalization.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Scale shape: the query's term list is a literal IN-filter applied to
the exploded token stream BEFORE any aggregation — only occurrences of
query terms are ever shuffled (O(Σ df(t)) rows, not O(corpus)). The
per-term document frequencies (≤ |query| rows) and the 1-row
(N, avgdl) corpus statistics ride broadcasts. One scan computes corpus
stats, one scan the filtered term stream; no join touches a
corpus-sized build side.

Reference: Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond" (FnTIR 2009).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query: ``(doc_id, matched,
    score)`` ordered by score desc then ``id_col`` asc (total order —
    docs with identical (tf, dl) profiles tie exactly, so the id
    tie-break is load-bearing). ``matched`` is the number of distinct
    query terms present. Scores are rounded to 6 decimals AFTER the
    per-document sum (the registry's float-rounding convention;
    summands are O(10) with ≤|query| terms, so 1-ulp summation-order
    noise sits ~1e-10 under the rounding grid).
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = docs.select(id_col, F.col(tokens_col).alias("__toks")).withColumn(
        "__dl", F.size("__toks")
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    hits = (
        toks.select(id_col, "__dl", F.explode("__toks").alias("word"))
        .where(F.col("word").isin(terms))
    )
    tf = hits.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("__tf"), F.max("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("__df"))
    scored = tf.join(F.broadcast(dfreq), "word").crossJoin(F.broadcast(stats))
    idf = F.log(
        1.0
        + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    # parenthesization pinned: the DuckDB oracle writes the same
    # association (float * is non-associative; identical op order ⇒
    # bit-identical doubles before the final rounding)
    wtd = (
        idf
        * (F.col("__tf") * (k1 + 1.0))
        / (
            F.col("__tf")
            + k1 * ((1.0 - b) + b * (F.col("__dl") / F.col("__avgdl")))
        )
    )
    return (
        scored.select(id_col, wtd.alias("__w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("matched"),
            F.round(F.sum("__w"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
