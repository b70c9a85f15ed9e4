"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting — the per-document scoring pass of a
training-data pipeline.

All pure Catalyst expressions (one codegen'd projection, zero shuffles,
zero Python) — by construction these run at scan speed on 100 TB and
are DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import DEFAULT_STOPWORDS, tokenize

#: tiny pinned English function-word list for the n-gram/stopword
#: language heuristic (deliberately NOT nltk's — no external dep, same
#: list inlined in the oracle SQL)
EN_MARKERS = DEFAULT_STOPWORDS + ("this", "that", "with", "for", "was", "are")

#: BPE-ish token pattern: word pieces OR single non-space punctuation.
#: Mirrors the common pre-tokenizer split (letters | digits | other).
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def en_marker_ratio(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are English function words."""
    t = tokenize(F.lower(F.col(text) if isinstance(text, str) else text))
    markers = F.array(*[F.lit(w) for w in EN_MARKERS])
    hits = F.size(F.filter(t, lambda x: F.array_contains(markers, x)))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t).cast("double")).otherwise(
        F.lit(0.0)
    )


def predict_language(text: Column | str, threshold: float = 0.05) -> Column:
    """n-gram-heuristic language ID.

    ASCII-ratio gate first (non-Latin scripts → 'other'), then English
    function-word density. A real pipeline plugs a trained n-gram model
    in here; the operator shape (pure projection) is identical.
    """
    c = F.col(text) if isinstance(text, str) else text
    ascii_ratio = (
        F.length(F.regexp_replace(c, r"[^\x00-\x7F]", "")).cast("double")
        / F.greatest(F.length(c), F.lit(1)).cast("double")
    )
    return (
        F.when(ascii_ratio < 0.8, F.lit("other"))
        .when(en_marker_ratio(c) >= threshold, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: lengths, ratios, a composite score.

    The standard cheap filters (Gopher/C4-style): length bounds, symbol
    ratio, stopword density, mean word length.
    """
    c = F.col(text_col)
    toks = tokenize(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    punct_chars = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    sw_ratio = en_marker_ratio(c)
    alpha_ratio = F.when(n_chars > 0, alpha_chars.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct_chars.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    # composite ∈ [0,1]: alpha-heavy, some stopwords, sane word lengths
    score = (
        F.least(alpha_ratio / 0.7, F.lit(1.0)) * 0.4
        + F.least(sw_ratio / 0.3, F.lit(1.0)) * 0.3
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
        + F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.1
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality_score"),
    )


def _quality_score_from(c: Column, toks: Column, ltoks: Column) -> Column:
    """The composite quality score over ALREADY-BOUND raw-case and
    lowercased token arrays (callers flet-bind; see
    :func:`quality_score_expr` / :func:`hygiene_gates_expr`) —
    numerically identical to the ``quality_score`` column
    ``quality_features`` emits (same sub-expressions, same rounding).
    The raw-case and lowercased arrays stay SEPARATE because ``lower()``
    is not length-preserving on all of Unicode (e.g. U+0130 → 2
    codepoints) and ``quality_features`` measures word length on the
    raw-case tokens."""
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    alpha_ratio = F.when(
        n_chars > 0, alpha_chars.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    markers = F.array(*[F.lit(w) for w in EN_MARKERS])
    n_tokens = F.size(toks)
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    hits = F.size(F.filter(ltoks, lambda x: F.array_contains(markers, x)))
    sw_ratio = F.when(
        F.size(ltoks) > 0, hits.cast("double") / F.size(ltoks).cast("double")
    ).otherwise(F.lit(0.0))
    score = (
        F.least(alpha_ratio / 0.7, F.lit(1.0)) * 0.4
        + F.least(sw_ratio / 0.3, F.lit(1.0)) * 0.3
        + F.when(
            (mean_word_len >= 3) & (mean_word_len <= 10), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        * 0.2
        + F.when(
            (n_tokens >= 10) & (n_tokens <= 100000), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        * 0.1
    )
    return F.round(score, 6)


def quality_score_expr(text: Column | str) -> Column:
    """The composite quality score ALONE, as one flet-bound expression —
    numerically identical to the ``quality_score`` column
    ``quality_features`` emits (same sub-expressions, same rounding).

    Exists for pipeline composition (operators/pipeline.corpus_funnel):
    a funnel stage that only gates on the score shouldn't pay a second
    corpus scan + join against the full ``quality_features`` output.
    Both token arrays are flet-bound (functions/expr.py) so the
    whitespace tokenization runs once per row, not once per reference.

    The built tree is memoized per process (functions/expr.memo_col):
    the ~300-node build costs ~0.16 s of py4j driver time per FRESH
    plan, recurring on every text-scoring query — construction caching
    only; results are pinned identical in tests."""
    from ..functions.expr import col_key, flet, memo_col

    c = F.col(text) if isinstance(text, str) else text

    def build() -> Column:
        return flet(
            tokenize(c),
            lambda toks: flet(
                tokenize(F.lower(c)),
                lambda ltoks: _quality_score_from(c, toks, ltoks),
            ),
        )

    return memo_col(("textstats.quality_score_expr", col_key(c)), build)


def hygiene_gates_expr(
    text: Column | str,
    top_token_max: float = 0.10,
    distinct_min: float = 0.25,
    top_bigram_max: float = 0.05,
) -> Column:
    """BOTH hygiene gates — ``struct(quality_score, is_repetitive)`` —
    over ONE bound lowered-token array. :func:`is_repetitive_expr`'s
    token array (``_raw_tokens`` = filter(split(lower(text)))) is the
    IDENTICAL expression to ``tokenize(lower(text))`` inside
    :func:`quality_score_expr`, but lambda-bound expressions are
    excluded from Spark's subexpression elimination, so a projection
    computing the two gates as separate columns lowercases and splits
    every document twice. Binding the array once serves both gates;
    each field is numerically identical to its standalone expression
    (same sub-expressions, same rounding — pinned in tests).

    For pipeline composition (operators/pipeline._hygiene_flags — the
    funnel's gate projection). Select the struct into its own column
    first, THEN expand the two fields (the repetition_features two-step
    pattern), or the multi-referenced struct re-runs the whole pipeline
    per field. Memoized per process like the standalone gates."""
    from ..functions.expr import col_key, flet, memo_col

    c = F.col(text) if isinstance(text, str) else text

    def build() -> Column:
        return flet(
            tokenize(c),
            lambda toks: flet(
                tokenize(F.lower(c)),
                lambda ltoks: F.struct(
                    _quality_score_from(c, toks, ltoks).alias("quality_score"),
                    _repetition_struct(
                        ltoks, top_token_max, distinct_min, top_bigram_max
                    )["is_repetitive"].alias("is_repetitive"),
                    # free byproduct of the bound array: the whitespace
                    # token count (== size(_raw_tokens(text))) — the
                    # datasheet query's third tokenize pass
                    F.size(ltoks).cast("long").alias("n_ws_tokens"),
                ),
            ),
        )

    return memo_col(
        (
            "textstats.hygiene_gates_expr",
            col_key(c),
            top_token_max,
            distinct_min,
            top_bigram_max,
        ),
        build,
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts per doc (budgeting pass)."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(c)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)).cast("long").alias("bpe_tokens"),
    )


def _raw_tokens(text: Column) -> Column:
    """Raw lowercased whitespace tokens, empties dropped (stopwords KEPT —
    repetition of function words is exactly what the filter looks for)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent values in a sorted array == the max
    multiplicity of any element — a linear Catalyst fold, so the top-token
    frequency costs O(L log L) per row (the sort) with NO explode/shuffle.
    The distributed explode→groupBy formulation computes the same number
    (the DuckDB oracle uses it); this one keeps the operator a pure
    projection that runs at scan speed on 100 TB."""
    step = lambda acc, t: F.struct(  # noqa: E731
        t.alias("prev"),
        F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_token_max: float = 0.10,
    distinct_min: float = 0.25,
    top_bigram_max: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: "fraction
    of characters in the most common n-gram" family), per document:

      * ``top_token_ratio``  — most frequent token's share of all tokens;
      * ``distinct_ratio``   — type/token ratio;
      * ``top_bigram_ratio`` — most frequent bigram's share of all bigrams;
      * ``is_repetitive``    — any threshold tripped (the drop flag).

    All pure Catalyst: per-row array sort + linear fold (see
    ``_max_run_length``), zero shuffles, zero Python — scan speed at
    100 TB, and each doc's state is bounded by its own length (no
    corpus-wide frequency table needed for these ratios).
    """
    from ..functions.expr import flet

    def features(toks: Column) -> Column:
        return _repetition_struct(toks, top_token_max, distinct_min, top_bigram_max)

    # materialize the struct in its own projection before expanding the
    # five fields: lambda-containing expressions are excluded from
    # Spark's subexpression elimination, so expanding feats[...] five
    # times in ONE select would run the whole tokenize/sort/fold
    # pipeline 5× per row (CollapseProject keeps a multi-referenced
    # non-trivial alias in its own project, so the two-step select
    # evaluates it once)
    feats = flet(_raw_tokens(F.col(text_col)), features)
    staged = docs.select(F.col(id_col).alias("doc_id"), feats.alias("_feats"))
    return staged.select(
        "doc_id",
        F.col("_feats")["n_tokens"].alias("n_tokens"),
        F.col("_feats")["top_token_ratio"].alias("top_token_ratio"),
        F.col("_feats")["distinct_ratio"].alias("distinct_ratio"),
        F.col("_feats")["top_bigram_ratio"].alias("top_bigram_ratio"),
        F.col("_feats")["is_repetitive"].alias("is_repetitive"),
    )


def _repetition_struct(
    toks: Column,
    top_token_max: float,
    distinct_min: float,
    top_bigram_max: float,
) -> Column:
    """The per-row Gopher-repetition struct over an ALREADY-BOUND token
    array (callers flet-bind; see repetition_features /
    is_repetitive_expr)."""
    # toks is flet-bound: every reference below hits the bound
    # variable, so the regex tokenization runs once per row — an
    # element_at(toks, i) inside the bigram lambda would otherwise
    # re-tokenize per position (O(tokens²) on long docs)
    n = F.size(toks)
    top_tok = _max_run_length(F.array_sort(toks))
    # positional bigrams; sequence(1, n-1) DESCENDS when n < 2 → guard
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_bi = _max_run_length(F.array_sort(bigrams))
    nd = n.cast("double")
    top_token_ratio = F.when(n > 0, top_tok.cast("double") / nd).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / nd
    ).otherwise(F.lit(0.0))
    top_bigram_ratio = F.when(
        n >= 2, top_bi.cast("double") / (nd - 1.0)
    ).otherwise(F.lit(0.0))
    flag = (
        (top_token_ratio > top_token_max)
        | (distinct_ratio < distinct_min)
        | (top_bigram_ratio > top_bigram_max)
    )
    return F.struct(
        n.cast("long").alias("n_tokens"),
        F.round(top_token_ratio, 6).alias("top_token_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_bigram_ratio, 6).alias("top_bigram_ratio"),
        flag.cast("int").alias("is_repetitive"),
    )


def is_repetitive_expr(
    text: Column | str,
    top_token_max: float = 0.10,
    distinct_min: float = 0.25,
    top_bigram_max: float = 0.05,
) -> Column:
    """The repetition drop-flag ALONE (int 0/1), numerically identical
    to the ``is_repetitive`` column of ``repetition_features`` —
    same defaults, same bound token array, same struct (the single
    field reference evaluates the struct once per row).

    For pipeline composition (operators/pipeline.corpus_funnel): a
    stage that only gates on the flag shouldn't pay a second corpus
    scan + join against the full feature output.

    The built tree is memoized per process (functions/expr.memo_col):
    the build costs ~0.3 s of py4j driver time per FRESH plan —
    construction caching only; results pinned identical in tests.
    """
    from ..functions.expr import col_key, flet, memo_col

    c = F.col(text) if isinstance(text, str) else text

    def build() -> Column:
        return flet(
            _raw_tokens(c),
            lambda toks: _repetition_struct(
                toks, top_token_max, distinct_min, top_bigram_max
            )["is_repetitive"],
        )

    return memo_col(
        (
            "textstats.is_repetitive_expr",
            col_key(c),
            top_token_max,
            distinct_min,
            top_bigram_max,
        ),
        build,
    )


def unigram_lm_scores(
    docs: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    vocab_k: int = 1000,
) -> DataFrame:
    """CCNet-style language-model quality score: per-doc unigram
    cross-entropy against the corpus's own top-``vocab_k`` distribution
    (Wenzek et al. 2020 filter by LM perplexity; the unigram model is
    the degenerate-but-scaleable member of that family).

    Model: p(w) = count(w)/total for the top-k vocabulary; every
    out-of-vocabulary token shares one OOV bucket whose mass is the
    remaining count (max'd with 1 so the log is finite when the corpus
    IS the vocabulary). Score = −mean log p over the doc's tokens —
    LOWER is more typical of the corpus. Empty docs score 0.

    Scale shape: one explode+groupBy builds the counts (the vocab_top100
    shuffle); the k-row model (plus its two scalars) is broadcast back
    against the exploded tokens, so scoring is a broadcast join + one
    hash agg on doc_id — the corpus is never shuffled by value. Vocab
    rank ties are pinned (count desc, word asc) for engine-stable
    truncation.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("word"))
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # partial top-k, merged on the driver) — NOT a global row_number
    # window, which would funnel the whole vocabulary through one task
    topk = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(vocab_k)
    # two scalars (corpus total, in-vocab total) ride a 1-row broadcast
    totals = counts.agg(F.sum("cnt").alias("total")).crossJoin(
        topk.agg(F.sum("cnt").alias("in_vocab"))
    )
    oov_logp = F.log(
        F.greatest(F.col("total") - F.col("in_vocab"), F.lit(1)).cast("double")
        / F.col("total").cast("double")
    )
    logp = F.when(
        F.col("cnt").isNotNull(),
        F.log(F.col("cnt").cast("double") / F.col("total").cast("double")),
    ).otherwise(oov_logp)
    scored = (
        toks.crossJoin(F.broadcast(totals))
        .join(F.broadcast(topk.select("word", "cnt")), "word", "left")
        .select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.round(-F.avg("logp"), 6).alias("lm_score"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    empty = docs.where(F.size(tokens_col) == 0).select(
        F.col(id_col).alias("doc_id"),
        F.lit(0.0).alias("lm_score"),
        F.lit(0).cast("long").alias("n_tokens"),
    )
    return scored.unionByName(empty)


#: PII patterns — RE2-compatible (no lookarounds), so the DuckDB oracle
#: runs the IDENTICAL regex strings. Deliberately simple/auditable; a
#: production deployment swaps in its compliance team's patterns at the
#: same three seams.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction pass: per-doc counts of emails / IPv4 literals /
    phone-ish numbers, plus the md5 of the scrubbed text. Scrub order is
    load-bearing: emails first (a digit run inside an address counts
    once, as the email), then IPv4 (dotted digit quads would otherwise
    match the looser phone pattern), phones last.

    Pure projection — three regexp_extract_all + three regexp_replace
    per row, zero shuffles, scan speed at 100 TB. Emitting the scrubbed
    hash rather than the scrubbed body keeps the audit output narrow;
    the production sink selects the scrubbed column itself.
    """
    c = F.col(text_col)
    scrub1 = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    scrub2 = F.regexp_replace(scrub1, IPV4_RE, "<IP>")
    scrub3 = F.regexp_replace(scrub2, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(scrub1, F.lit(IPV4_RE), 0)).cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(scrub2, F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.length(scrub3).cast("long").alias("scrubbed_chars"),
        F.md5(scrub3).alias("scrubbed_md5"),
    )


#: RE2-compatible markup patterns (no backreferences — RE2 has none, so
#: script and style blocks get separate patterns; (?is) inline flags and
#: lazy .*? are supported by both Java regex and RE2)
SCRIPT_BLOCK_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_BLOCK_RE = r"(?is)<style[^>]*>.*?</style>"
TAG_RE = r"<[^>]+>"

#: HTML entity → replacement, applied in fixed order (amp LAST so
#: double-escaped '&amp;lt;' decodes to '&lt;' not '<' — the standard
#: single-pass unescape semantics)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(text: Column | str) -> Column:
    """Plain text from HTML-ish markup: drop script/style blocks, strip
    tags, unescape the common entities, collapse whitespace — the first
    step of every web-corpus ingest (the WET-extraction stage of a
    Common Crawl-style pipeline), as a pure Catalyst projection.

    Not a full HTML5 parser (comments/CDATA/attribute edge cases are a
    real parser's job — that seam is the same one as the multimodal
    codec: plug trafilatura/bs4 behind mapInPandas when fidelity
    matters). What this IS: deterministic, engine-identical (every
    pattern RE2-compatible so the DuckDB oracle runs the same regexes),
    and zero-shuffle at 100 TB.
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, SCRIPT_BLOCK_RE, " ")
    c = F.regexp_replace(c, STYLE_BLOCK_RE, " ")
    c = F.regexp_replace(c, TAG_RE, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def markup_strip_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc markup-extraction audit: raw/clean char counts, number of
    tags removed, md5 of the extracted text. Same narrow-audit shape as
    :func:`pii_scrub` — the production sink selects the clean column."""
    c = F.col(text_col)
    clean = strip_markup(c)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(c).cast("long").alias("raw_chars"),
        F.size(F.regexp_extract_all(c, F.lit(TAG_RE), 0)).cast("long").alias("n_tags"),
        F.length(clean).cast("long").alias("clean_chars"),
        F.md5(clean).alias("clean_md5"),
    )


def fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_chars: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Document fingerprints: full-content md5 + min/max of strided
    character-shingle hashes (a winnowing-style robust fingerprint —
    agrees for docs differing only at one edit site with high
    probability).

    Shingles: substrings of length ``shingle_chars`` at positions
    1, 1+stride, … — via sequence+transform, pure Catalyst.
    """
    c = F.col(text_col)
    n = F.length(c)
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - shingle_chars + 1, F.lit(1)),
        F.lit(stride),
    )
    sh_hashes = F.transform(starts, lambda i: F.md5(c.substr(i, F.lit(shingle_chars))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(c).alias("content_md5"),
        F.array_min(sh_hashes).alias("min_shingle_hash"),
        F.array_max(sh_hashes).alias("max_shingle_hash"),
    )
