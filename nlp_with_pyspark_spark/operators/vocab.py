"""Vocabulary build (R1) — the reference's ``get_dict``.

Reference (RDD_logisticregression.py:59-66):
    flatMap tokens → map (w,1) → reduceByKey(add) → top(10000, key=count)
    → parallelize → zipWithIndex → (word, rank)

Spark-first formulation: ``explode → groupBy.count`` compiles to a
HashAggregate with map-side partial aggregation (the same optimization the
reference hand-picked reduceByKey for — SURVEY §4.1), and
``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each task
keeps a k-item heap, the driver merges — no global sort, no full shuffle
of the word counts. At 100 TB the only full-data shuffle is the word
hash-partition for the count, which is irreducible.

Tie-break is pinned to (count DESC, word ASC) — ``RDD.top`` on ties
ordered by the full tuple; an unpinned ``orderBy(desc(count)).limit(k)``
is nondeterministic and was flagged as the #1 cross-engine divergence
source (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_counts(df: DataFrame, tokens_col: Column | str = "tokens") -> DataFrame:
    """A1: corpus word counts. Returns (word, count)."""
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return (
        df.select(F.explode(tokens).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def top_k_vocabulary(df: DataFrame, k: int, tokens_col: Column | str = "tokens") -> DataFrame:
    """R1: top-k words by corpus frequency → (word, count, idx).

    idx = dense 0-based rank by (count DESC, word ASC), so idx 0 is the
    most frequent word — matching the reference's dictionary orientation
    (RDD_logisticregression.py:63-66) but with a deterministic tie-break.

    The ``row_number`` window here runs over at most k rows (post-limit),
    so the single-partition window is not a scale concern.
    """
    counts = word_counts(df, tokens_col).orderBy(F.desc("count"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("count"), F.asc("word"))
    return counts.withColumn("idx", F.row_number().over(w) - F.lit(1))


def pmi_collocations(
    df: DataFrame,
    tokens_col: Column | str = "tokens",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information:
    ``(ngram, count, pmi)`` ordered pmi desc then ngram asc, restricted
    to bigrams with ``count ≥ min_count`` (the standard PMI floor —
    rare pairs otherwise dominate with inflated scores).

        pmi(a,b) = ln( (c_ab/N2) / ((c_a/N1) · (c_b/N1)) )

    with exact BIGINT counts (c_ab bigram count, N2 total bigrams, c_a
    unigram counts, N1 total tokens) — divisions of exact longs in a
    PINNED association order, so both engines feed ``ln`` the same
    double and the 6-decimal rounding absorbs its 1-ulp.

    Scale shape: ONE corpus pass — the unigram and bigram streams are
    exploded together as tagged ``(n, gram)`` structs into a single
    count aggregation (the per-doc row fan-out, ``2·len−1``, equals the
    two separate explodes'), and the counts frame is materialized once
    (localCheckpoint) so its four consumers — the candidate filter, the
    unigram lookup joined twice, and the two totals — read
    aggregate-sized data instead of each re-running a corpus-wide
    explode+shuffle (separately-built ``word_counts``/``ngram_counts``
    frames did exactly that: four full-corpus aggregations per
    materialization, 34-Exchange plan). The ``min_count`` floor is
    applied to the bigram counts BEFORE any join, so only surviving
    collocation candidates (≤ vocab²/floor, in practice thousands)
    proceed; the unigram table — corpus-vocabulary-sized, too big to
    broadcast at 100 TB — is first semi-filtered to the candidates'
    member words under a broadcast and THEN broadcast-joined twice
    (word_a, word_b). The only full-data shuffle is the combined count
    aggregation itself. Counts are identical to the separate
    ``word_counts``/``ngram_counts`` frames (same explode multiset per
    stream, the tag disambiguates a bigram string colliding with a
    token — pinned in tests).
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    uni_part = F.transform(
        tokens, lambda x: F.struct(F.lit(1).alias("n"), x.alias("gram"))
    )
    # the bigram window build is ngram_counts' expression verbatim
    # (n=2), struct-tagged; the `when` guard matters for the same
    # reason (sequence(1, 0) DESCENDS)
    bi_part = F.when(
        F.size(tokens) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(1)),
            lambda i: F.struct(
                F.lit(2).alias("n"),
                F.concat_ws(
                    " ", F.element_at(tokens, i), F.element_at(tokens, i + 1)
                ).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))
    counts = (
        df.select(F.explode(F.concat(uni_part, bi_part)).alias("g"))
        .groupBy(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("count"))
        .localCheckpoint()
    )
    uni = counts.where(F.col("n") == 1).select(
        F.col("gram").alias("word"), F.col("count").alias("__ca")
    )
    n1 = uni.agg(F.sum("__ca").alias("__n1"))
    bi = counts.where(F.col("n") == 2).select(F.col("gram").alias("ngram"), "count")
    n2 = bi.agg(F.sum("count").alias("__n2"))
    cand = bi.where(F.col("count") >= min_count).select(
        "ngram",
        "count",
        F.split_part(F.col("ngram"), F.lit(" "), F.lit(1)).alias("__wa"),
        F.split_part(F.col("ngram"), F.lit(" "), F.lit(2)).alias("__wb"),
    )
    needed = cand.select(F.explode(F.array("__wa", "__wb")).alias("word")).distinct()
    uni_small = F.broadcast(uni.join(F.broadcast(needed), "word", "left_semi"))
    scored = (
        cand.join(uni_small.select(F.col("word").alias("__wa"), F.col("__ca")), "__wa")
        .join(
            uni_small.select(F.col("word").alias("__wb"), F.col("__ca").alias("__cb")),
            "__wb",
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    pmi = F.log(
        (F.col("count").cast("double") / F.col("__n2").cast("double"))
        / (
            (F.col("__ca").cast("double") / F.col("__n1").cast("double"))
            * (F.col("__cb").cast("double") / F.col("__n1").cast("double"))
        )
    )
    return (
        scored.select("ngram", "count", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("ngram"))
        .limit(k)
    )


def ngram_counts(df: DataFrame, n: int = 2, tokens_col: Column | str = "tokens") -> DataFrame:
    """Corpus n-gram counts → (ngram, count), space-joined tokens.

    The n-gram build is a pure codegen projection: ``sequence(1, len-n+1)
    → transform(window slice) → explode`` — no UDF, no shuffle until the
    count. Rows with fewer than n tokens contribute nothing (the
    ``when`` guard matters: ``sequence(1, 0)`` DESCENDS in Spark, so the
    unguarded expression would fabricate a reversed window per short
    row instead of an empty one).

    Same scale shape as ``word_counts``: the only full-data shuffle is
    the hash partition on the n-gram key, after map-side partials. The
    explode fan-out is ~len(tokens) rows per doc per n — n-gram keys are
    wider than words, so at 100 TB the shuffle payload is the cost to
    watch; a frequency floor (HAVING count > t) belongs in the consumer,
    pushed into the partial aggregate.
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    grams = F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def top_k_ngrams(
    df: DataFrame, k: int, n: int = 2, tokens_col: Column | str = "tokens"
) -> DataFrame:
    """Top-k n-grams by corpus frequency, tie-break (count DESC, ngram
    ASC) — TakeOrderedAndProject per task, driver merge, like
    ``top_k_vocabulary``."""
    return ngram_counts(df, n, tokens_col).orderBy(F.desc("count"), F.asc("ngram")).limit(k)
