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
from .operators import relational, windows
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


# ---------------------------------------------------------------------------
# Relational: scans, filters, joins, hash aggs, top-k (S*, P*, J*, A*, T*)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped agg (A1/A4/A5): pushdown filter + hash agg."""
    return relational.pricing_summary(read_table(spark, sf_dir, "lineitem"))


@query(
    "top_parts_by_revenue",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, p_brand, revenue, n_items
    FROM rev JOIN part ON l_partkey = p_partkey
    ORDER BY revenue DESC, p_partkey ASC
    LIMIT 20
    """,
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+T1: agg-before-join, broadcast dim, pinned top-k."""
    return relational.top_parts_by_revenue(
        read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "part")
    )


@query(
    "customer_nation_revenue",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_revenue
        FROM orders GROUP BY o_custkey
    )
    SELECT r_name, n_name,
           CAST(sum(CAST(cust_revenue AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_customers
    FROM per_cust
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def customer_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-broadcast-join rollup (star-schema shape)."""
    return relational.customer_nation_revenue(
        read_table(spark, sf_dir, "customer"),
        read_table(spark, sf_dir, "orders"),
        read_table(spark, sf_dir, "nation"),
        read_table(spark, sf_dir, "region"),
    )


@query(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        FROM orders
    )
    WHERE rank <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (SURVEY §2.5 — per-group top-k)."""
    return relational.top_orders_per_customer(read_table(spark, sf_dir, "orders"))


@query(
    "order_priority_counts",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    GROUP BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi existence join (absent-in-reference join type)."""
    return relational.order_priority_counts(
        read_table(spark, sf_dir, "orders"), read_table(spark, sf_dir, "lineitem")
    )


# ---------------------------------------------------------------------------
# Event-time windows + JSON (batch formulations of streaming/, SURVEY §2.12)
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_5m",
    """
    WITH e AS (SELECT *, epoch_ns(ts) // 1000000000 AS sec FROM events)
    SELECT sec - (sec % 300) AS bucket_start_epoch,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM e
    GROUP BY 1, 2
    """,
)
def events_tumbling_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window, batch form."""
    return windows.tumbling_counts(read_table(spark, sf_dir, "events"), 300)


@query(
    "events_sliding_10m",
    """
    WITH e AS (SELECT event_type, value, epoch_ns(ts) // 1000000000 AS sec FROM events)
    SELECT window_start_epoch, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
        SELECT event_type, value,
               unnest(generate_series(((sec - 600) - ((sec - 600) % 300)) + 300,
                                      sec - (sec % 300),
                                      300)) AS window_start_epoch
        FROM e
    )
    GROUP BY 1, 2
    """,
)
def events_sliding_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (width 600s, slide 300s) via covering-bucket explode."""
    return windows.sliding_counts(read_table(spark, sf_dir, "events"), 600, 300)


@query(
    "events_session_stats",
    """
    WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, epoch_ns(ts) // 1000000000 AS sec FROM events),
    lagged AS (
        SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev FROM e
    ),
    flagged AS (
        SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_sess
        FROM lagged
    ),
    sess AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    per AS (
        SELECT user_id, session_id, count(*) AS n_events,
               min(sec) AS s, max(sec) AS e2
        FROM sess GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(e2 - s) AS BIGINT) AS longest_session_sec
    FROM per GROUP BY user_id
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands), per-user rollup."""
    return windows.session_stats(read_table(spark, sf_dir, "events"), 1800)


@query(
    "events_json_stats",
    """
    WITH e AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
    SELECT event_type, count(*) AS n_events,
           CAST(sum(k) AS BIGINT) AS sum_k,
           round(avg(k), 6) AS avg_k,
           min(k) AS min_k, max(k) AS max_k
    FROM e GROUP BY event_type
    """,
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on events.props (get_json_object) + stats."""
    return windows.json_props_stats(read_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# EDA / metrics (A8/R11 confusion aggs, E2 histogram)
# ---------------------------------------------------------------------------


@query(
    "confusion_metrics",
    """
    WITH p AS (
        SELECT CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END AS pred,
               CASE WHEN label = 1 THEN 1 ELSE 0 END AS y
        FROM embeddings
    )
    SELECT CAST(sum(CASE WHEN pred=1 AND y=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred=0 AND y=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(sum(CASE WHEN pred=1 AND y=0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN pred=0 AND y=1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           round(CAST(sum(CASE WHEN pred=y THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS accuracy,
           round(CAST(sum(CASE WHEN pred=1 AND y=1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / (sum(CASE WHEN pred=1 AND y=1 THEN 1 ELSE 0 END)
                    + 0.5 * (sum(CASE WHEN pred=1 AND y=0 THEN 1 ELSE 0 END)
                             + sum(CASE WHEN pred=0 AND y=1 THEN 1 ELSE 0 END))), 6) AS f1
    FROM p
    """,
)
def confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/R11: one-pass confusion matrix + accuracy/F1 as conditional
    aggregates (replaces the reference's tuple-reduce,
    RDD_logisticregression.py:183-189,229-242). Prediction rule here is a
    deterministic stand-in (embedding[0] > 0) so the oracle can check the
    aggregation shape."""
    from .operators.metrics import confusion_from_predictions

    emb = read_table(spark, sf_dir, "embeddings")
    preds = emb.select(
        F.when(F.element_at("embedding", 1) > 0, 1).otherwise(0).alias("pred"),
        F.when(F.col("label") == 1, 1).otherwise(0).alias("y"),
    )
    return confusion_from_predictions(preds)


@query(
    "doc_length_histogram",
    """
    SELECT CAST(floor(n_chars / 100) AS BIGINT) * 100 AS bucket,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: histogram via floor-bucket groupBy."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy((F.floor(F.col("n_chars") / 100) * 100).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
