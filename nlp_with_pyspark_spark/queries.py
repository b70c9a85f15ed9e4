"""Query registry — every implemented operator gets a (spark, oracle-SQL) pair.

This is the engine's correctness surface: ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin re-exports of ``QUERIES`` / ``ORACLES`` here.
The driver runs each Spark query and its DuckDB oracle side-by-side at
sf0.01 and compares row-count + schema + order-insensitive value hash.

Conventions (driver contract):
  * every computed column aliased identically in Spark and SQL;
  * floating-point aggregates rounded to a scale with ≥1000× headroom
    over accumulated summation error, so both engines agree bit-for-bit
    after rounding (doubles summed in different orders differ in the
    last bits);
  * all top-k orderings totally ordered (documented tie-breaks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import DEFAULT_STOPWORDS, tokens_pipeline
from .operators.features import tf_idf
from .operators.vocab import top_k_vocabulary
from .sources.io import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_SW_SQL_LIST = ", ".join(f"'{w}'" for w in DEFAULT_STOPWORDS)

#: DuckDB expression equivalent of functions.text.tokens_pipeline('text'):
#: clean (lower → strip url/@ → strip non-letters → ltrim) → split on \s+
#: → drop empties → drop stopwords.  Mirrors the Spark expression exactly;
#: both regex dialects (Java / RE2) agree on these patterns.
TOKENS_SQL = (
    "list_filter("
    "string_split_regex("
    "ltrim(regexp_replace(regexp_replace(lower(text), '(?:@|https?://)\\S+', '', 'g'),"
    " '[^a-z]', ' ', 'g')),"
    " '\\s+'),"
    f" t -> t <> '' AND t NOT IN ({_SW_SQL_LIST})"
    ")"
)


def query(name: str, sql: str | None = None):
    """Register a query; ``sql=None`` ⇒ rows-only check (non-SQL-expressible)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _tokenized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.withColumn("tokens", tokens_pipeline(F.col("text")))


# ---------------------------------------------------------------------------
# Text pipeline: vocabulary / TF-IDF (R1, R2, R3, F1-F3, F5, F8, F9, F12)
# ---------------------------------------------------------------------------


@query(
    "vocab_top100",
    f"""
    WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
    words AS (SELECT unnest(tokens) AS word FROM toks),
    counts AS (SELECT word, count(*) AS count FROM words GROUP BY word)
    SELECT word, count,
           CAST(row_number() OVER (ORDER BY count DESC, word ASC) - 1 AS INT) AS idx
    FROM counts
    ORDER BY count DESC, word ASC
    LIMIT 100
    """,
)
def vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: top-k vocabulary over documents, pinned tie-break (SURVEY §2.6)."""
    return top_k_vocabulary(_tokenized_documents(spark, sf_dir), k=100)


@query(
    "tfidf_long",
    f"""
    WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
    counts AS (
        SELECT word, count(*) AS count
        FROM (SELECT unnest(tokens) AS word FROM toks)
        GROUP BY word
    ),
    vocab AS (
        SELECT word, CAST(row_number() OVER (ORDER BY count DESC, word ASC) - 1 AS INT) AS idx
        FROM counts ORDER BY count DESC, word ASC LIMIT 100
    ),
    doc_words AS (
        SELECT DISTINCT doc_id, len(tokens) AS n_tokens, unnest(tokens) AS word
        FROM toks
    ),
    tf AS (
        SELECT dw.doc_id, dw.word, v.idx, 1.0 / dw.n_tokens AS tf
        FROM doc_words dw JOIN vocab v USING (word)
    ),
    dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf)
    SELECT tf.doc_id, tf.word, tf.idx,
           round(tf.tf * ln(n.n_docs / CAST(dfreq.df AS DOUBLE)), 8) AS tfidf
    FROM tf, dfreq, n
    WHERE tf.word = dfreq.word
    """,
)
def tfidf_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2+R3: presence-TF × unsmoothed IDF, long form (SURVEY §2.10).

    Preserves the reference's presence-TF distinct collapse, inner-join
    document drop, and unsmoothed log(N/df) — see operators/features.py.
    """
    docs = _tokenized_documents(spark, sf_dir)
    vocab = top_k_vocabulary(docs, k=100)
    out = tf_idf(docs, vocab)
    return out.select("doc_id", "word", "idx", F.round("tfidf", 8).alias("tfidf"))


@query(
    "doc_token_stats",
    f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(length(text) AS DOUBLE)), 4) AS avg_chars,
           round(avg(CAST(len({TOKENS_SQL}) AS DOUBLE)), 4) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5+E4: per-group count & means (class-balance / avg-length EDA,
    Part1.ipynb[15,17,20,21]) — over documents.lang."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text").cast("double")), 4).alias("avg_chars"),
        F.round(F.avg(F.size(tokens_pipeline(F.col("text"))).cast("double")), 4).alias(
            "avg_tokens"
        ),
    )
