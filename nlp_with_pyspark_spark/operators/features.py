"""TF / TF-IDF featurization (R2, R3) — the heart of the reference.

Reference RDD dataflow (RDD_logisticregression.py:70-100):
    flatMap (word,(doc,label,len)) → distinct → join(dictionary)
    → groupByKey(doc) → dense np.ndarray(10000) per row
    → indicator reduce for document frequency → idf = log(N/df) → tf*idf

Two deliberate-compatibility semantics preserved (SURVEY §2.3):
  * **Presence-TF**: the ``distinct`` collapses token occurrences, so
    tf[w] = 1{w ∈ doc} / len(tokens) — binary presence over document
    length, not a true term frequency. ``true_tf=True`` offers the
    standard count/len variant.
  * **Inner-join drop (J2)**: documents containing zero vocabulary words
    vanish from the output.
  * **Unsmoothed IDF**: idf = log(N/df) — NOT MLlib's log((N+1)/(df+1)).
    ``smoothed=True`` switches to the MLlib formula (M4).

Scale design: everything long-form ``(doc_id, idx, tfidf)`` — the
reference's dense 10k-dim NumPy row (80 KB/row!) is its scaling cliff
(SURVEY §4.2). Long form IS the sparse representation; a 100 TB corpus
with a 10k vocab stays proportional to the number of (doc, word) pairs.
The vocab join broadcasts (vocab ≤ a few MB), so the only shuffles are
the count aggregations, each with map-side partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_words(docs: DataFrame, doc_col: str, tokens_col: str, presence: bool) -> DataFrame:
    """Explode tokens → (doc, word, n_tokens [, occurrences])."""
    base = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.size(F.col(tokens_col)).alias("n_tokens"),
        F.explode(F.col(tokens_col)).alias("word"),
    )
    if presence:
        # distinct ≡ the reference's .distinct() presence collapse (J3)
        return base.distinct().withColumn("occurrences", F.lit(1).cast("long"))
    return base.groupBy("doc_id", "n_tokens", "word").agg(
        F.count(F.lit(1)).alias("occurrences")
    )


def presence_tf(
    docs: DataFrame,
    vocab: DataFrame,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    true_tf: bool = False,
) -> DataFrame:
    """R2: long-form TF against a (word, idx) vocabulary.

    Returns (doc_id, word, idx, tf). Inner join ⇒ docs with no vocab
    words are dropped (J2 semantics, RDD_logisticregression.py:84-90).
    """
    dw = _doc_words(docs, doc_col, tokens_col, presence=not true_tf)
    joined = dw.join(F.broadcast(vocab.select("word", "idx")), "word", "inner")
    return joined.select(
        "doc_id",
        "word",
        "idx",
        (F.col("occurrences").cast("double") / F.col("n_tokens").cast("double")).alias("tf"),
    )


def document_frequency(tf_long: DataFrame) -> DataFrame:
    """A7/R3 prelude: df[w] = #docs containing w, from long-form TF.

    Long-form input already has one row per (doc, word), so this is a
    plain count — the columnar formulation of the reference's
    indicator-vector ``reduce(np.add)`` (RDD_logisticregression.py:96-97),
    which funnels every partial vector through the driver; this stays
    fully distributed.
    """
    return tf_long.groupBy("word", "idx").agg(F.count(F.lit(1)).alias("df"))


def tf_idf(
    docs: DataFrame,
    vocab: DataFrame,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    smoothed: bool = False,
    true_tf: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """R3: long-form TF-IDF → (doc_id, word, idx, tf, idf, tfidf).

    N = the FULL pre-join corpus count, matching the reference:
    ``numberOftweets = RDD.count()`` runs before any vocabulary join
    (RDD_logisticregression.py:193) and is what get_tf_idfArray divides
    by (:216). Documents dropped by the inner join (no vocab words)
    still count toward N, so idf = log(N/df) can exceed log(n_joined/df).
    The count is column-free, so Catalyst prunes the tokenize lineage —
    at parquet scale it's a metadata count, not a corpus pass.
    """
    tf_long = presence_tf(docs, vocab, doc_col, tokens_col, true_tf=true_tf)
    if materialize:
        # tf_long feeds the document-frequency agg AND the final join;
        # without a barrier each consumer re-runs the full
        # tokenize→explode→distinct→join lineage — multiple corpus
        # passes, measured ~2× the runtime at sf0.1. localCheckpoint
        # materializes it once to executor-local storage and truncates
        # the lineage. (On a real cluster with executor churn, swap for
        # reliable checkpointing or an explicit intermediate table.)
        tf_long = tf_long.localCheckpoint()
    dfreq = document_frequency(tf_long)
    n_docs = docs.count()
    if smoothed:
        idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(0.0)
    else:
        idf = F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
    dfreq = dfreq.select("word", F.col("df"), idf.alias("idf"))
    return (
        tf_long.join(F.broadcast(dfreq), "word")
        .select(
            "doc_id",
            "word",
            "idx",
            "tf",
            "idf",
            (F.col("tf") * F.col("idf")).alias("tfidf"),
        )
    )


def to_sparse_vectors(tfidf_long: DataFrame, value_col: str = "tfidf") -> DataFrame:
    """Collapse long form → per-doc sparse vector (indices[], values[]).

    indices are sorted ascending; this is the shape the distributed
    trainers (ml/gd.py) consume — never densified until inside the
    Arrow batch, and only to k dims there.
    """
    return (
        tfidf_long.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx"), F.col(value_col).alias("v")))
            ).alias("pairs")
        )
        .select(
            "doc_id",
            F.transform("pairs", lambda p: p["idx"]).alias("indices"),
            F.transform("pairs", lambda p: p["v"]).alias("values"),
        )
    )
