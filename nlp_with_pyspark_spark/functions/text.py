"""Text scalar/array functions — JVM-native first (SURVEY §2.8).

The reference implements F1-F9 as row-at-a-time Python UDFs
(LogisticRegression.py:25-39,60-62) or RDD closures
(RDD_logisticregression.py:41-57). Every one of them except
unidecode/lemmatize has a built-in Catalyst expression; using the
built-ins keeps the whole text pipeline inside WholeStageCodegen with no
Python-worker round-trip — the single biggest per-row speedup over the
reference (~10-100× for the hot path).

Mapping (reference → here):
  * F1 lower            (LogisticRegression.py:28)  → ``F.lower``
  * F2 URL/@ strip      (LogisticRegression.py:30)  → ``F.regexp_replace``
  * F3 non-letter strip (LogisticRegression.py:32)  → ``F.regexp_replace`` + ``F.ltrim``
  * F5 tokenize         (LogisticRegression.py:71)  → ``F.split`` on whitespace
  * F8 token count      (LogisticRegression.py:61)  → ``F.size`` (native, not a UDF)
  * F9 stop-word filter (LogisticRegression.py:35-39) → ``F.filter`` lambda
    (NOT ``F.array_except`` — that dedups the array, which would silently
    change term frequencies; ``filter`` preserves multiplicity)
  * F4 unidecode / F6 lemmatize — Python-only; gated pandas_udf below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stop-word list used by engine queries. Deliberately small and pinned
#: (NOT nltk's — keeps the oracle-checked path free of external deps; the
#: reference's nltk list + custom additions lives at
#: RDD_logisticregression.py:38-40 and is only used on the tweet replay
#: path, see ml/).
DEFAULT_STOPWORDS = ("a", "an", "and", "in", "is", "it", "of", "on", "or", "the", "to")


def clean_text(col: Column | str) -> Column:
    """F1+F2+F3: lowercase, strip URLs/@mentions, strip non-letters.

    Reference chain (LogisticRegression.py:25-32; RDD variant
    RDD_logisticregression.py:44-51):
        lower → re.sub(r'(?:@|https?://)\\S+','') → re.sub('[^a-zA-Z]',' ') → lstrip
    Expressed as native ``regexp_replace`` so it stays in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"(?:@|https?://)\S+", "")
    c = F.regexp_replace(c, r"[^a-z]", " ")
    return F.ltrim(c)


def tokenize(col: Column | str) -> Column:
    """F5: whitespace tokenize, dropping empty strings.

    ``split`` on ``\\s+`` leaves one leading "" when the string starts
    with whitespace and one trailing "" slot on empty input; the
    ``filter`` removes both, matching nltk/Tokenizer behavior for
    space-separated text.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def filter_stopwords(tokens: Column | str, stopwords=DEFAULT_STOPWORDS) -> Column:
    """F9: drop stop-words, preserving duplicates of kept tokens.

    The reference's UDF (LogisticRegression.py:35-39) is a list
    comprehension that keeps multiplicity — so must we. ``array_except``
    would dedup; ``F.filter`` + ``array_contains`` is the multiplicity-
    preserving native form.
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.filter(c, lambda t: ~F.array_contains(sw, t))


def token_count(tokens: Column | str) -> Column:
    """F8: array length — native ``size``, replacing the reference's
    ``udf(lambda x: len(x), IntegerType())`` (LogisticRegression.py:61)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(c)


def tokens_pipeline(text_col: Column | str, stopwords=DEFAULT_STOPWORDS) -> Column:
    """clean → tokenize → stop-filter in one expression tree.

    Memoized per process (functions/expr.memo_col): the tree build
    costs ~0.03 s of py4j driver time per fresh plan and this column
    heads nearly every text query's plan — construction caching only;
    results pinned identical in tests/test_expr.py."""
    from .expr import col_key, memo_col

    return memo_col(
        ("text.tokens_pipeline", col_key(text_col), tuple(stopwords)),
        lambda: filter_stopwords(tokenize(clean_text(text_col)), stopwords),
    )


def lemmatize_udf():
    """F4+F6: unidecode + WordNet lemmatization (RDD_logisticregression.py:41-57).

    Python-only by nature (SURVEY §7.4); nltk/unidecode are not in this
    container, so this returns an Arrow-batched pandas_udf that lazily
    initializes the libraries per executor and falls back to a
    deterministic no-op lemmatizer (identity + ASCII fold) when they are
    absent. Excluded from the oracle-checked path either way.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    # no type hints: PEP-563 stringized annotations (module-level
    # ``from __future__ import annotations``) break pyspark's hint
    # resolution; the legacy no-hint form infers a scalar pandas UDF
    @pandas_udf(ArrayType(StringType()))
    def _lemmatize(tokens):
        try:  # per-executor lazy init, once per python worker
            from nltk.stem import WordNetLemmatizer  # type: ignore

            lemmer = WordNetLemmatizer()

            def lem(ws):
                return [lemmer.lemmatize(w) for w in ws]

        except Exception:

            def lem(ws):  # deterministic fallback: ASCII fold only
                return [w.encode("ascii", "ignore").decode() for w in ws]

        return tokens.map(lem)

    return _lemmatize
