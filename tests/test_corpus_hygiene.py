"""Unit tests for the corpus-hygiene operators added in round 5:
decontamination, PII scrub, int8 quantization, canonical dedup output.
The registered queries are additionally hash-checked against DuckDB in
test_oracle_parity; these pin semantics on hand-built edge cases."""

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "tokens", F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit(""))
    )


def test_benchmark_overlap_full_containment(spark):
    from nlp_with_pyspark_spark.operators.decontam import benchmark_overlap

    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    corpus = _docs(
        spark,
        [
            # contains every benchmark 3-gram => contamination 1.0
            (1, "prefix words the quick brown fox jumps suffix words"),
            # shares exactly one of the three benchmark 3-grams
            (2, "unrelated stuff the quick brown nothing else here"),
            # no overlap at all
            (3, "completely different text with no shared phrases"),
        ],
    )
    got = {
        (r.doc_id, r.bench_id): (r.n_common, r.contamination)
        for r in benchmark_overlap(corpus, bench, n=3, threshold=0.0).collect()
    }
    # benchmark has 3 shingles: "the quick brown", "quick brown fox", "brown fox jumps"
    assert got[(1, 100)] == (3, 1.0)
    assert got[(2, 100)][0] == 1
    assert got[(2, 100)][1] == pytest.approx(1 / 3, abs=1e-8)
    assert (3, 100) not in got


def test_benchmark_overlap_threshold_filters(spark):
    from nlp_with_pyspark_spark.operators.decontam import benchmark_overlap

    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    corpus = _docs(spark, [(2, "unrelated stuff the quick brown nothing else")])
    assert benchmark_overlap(corpus, bench, n=3, threshold=0.5).count() == 0


def test_fuzzy_overlap_equals_symmetric_cross_pairs(spark):
    """Equivalence contract (mirrors the delta-dedup contract): the
    asymmetric broadcast path emits EXACTLY the corpus↔bench pairs of
    the symmetric batch run over the union — same signatures, same
    banding, same verify — with the uncapped batch path (the asymmetric
    plan has no bucket cap by design: its docstring explains why)."""
    from nlp_with_pyspark_spark.operators.decontam import fuzzy_benchmark_overlap
    from nlp_with_pyspark_spark.operators.dedup import minhash_dedup_pairs

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now",
        "how vexingly quick daft zebras jump over fences daily",
        "sphinx of black quartz judge my vow completely again",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((10 * i, t))  # bench side (doc_id % 10 == 0)
        rows.append((10 * i + 1, t + " extra"))  # near-dup corpus twin
        rows.append((10 * i + 2, t.replace("the", "a")))  # fuzzier twin
    docs = _docs(spark, rows)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)

    got = {
        (r.doc_id, r.bench_id, r.jaccard)
        for r in fuzzy_benchmark_overlap(
            corpus, bench, n=3, k=12, bands=4, threshold=0.1
        ).collect()
    }
    batch = minhash_dedup_pairs(
        docs, n=3, k=12, bands=4, threshold=0.1, max_docs_per_bucket=10**9
    ).collect()
    want = set()
    for r in batch:
        a_is_bench, b_is_bench = r.doc_a % 10 == 0, r.doc_b % 10 == 0
        if a_is_bench == b_is_bench:
            continue  # bench↔bench and corpus↔corpus pairs are out of scope
        if a_is_bench:
            want.add((r.doc_b, r.doc_a, r.jaccard))
        else:
            want.add((r.doc_a, r.doc_b, r.jaccard))
    assert got == want and got  # non-vacuous: the twins must collide


def test_fuzzy_overlap_plan_is_broadcast_only(spark):
    """The 100 TB claim: every join in the fuzzy-decontam plan
    broadcasts its benchmark/candidate side — no join ever shuffles the
    corpus. (The distinct on collision pairs is the plan's only shuffle
    and moves O(collisions) id-pair rows, not corpus rows.)"""
    from nlp_with_pyspark_spark.operators.decontam import fuzzy_benchmark_overlap
    from nlp_with_pyspark_spark.plans.inspect import assert_no_shuffle_joins

    docs = _docs(
        spark, [(i, f"doc number {i} with some shared filler text here") for i in range(20)]
    )
    out = fuzzy_benchmark_overlap(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        n=3,
        threshold=0.1,
        materialize=False,
    )
    assert_no_shuffle_joins(out)


def test_decontaminated_corpus_applies_both_passes(spark):
    from nlp_with_pyspark_spark.operators.decontam import decontaminated_corpus

    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            # exact pass: quotes the whole benchmark inside a long doc
            # (high containment; whole-doc jaccard low)
            (
                1,
                "a very long introduction paragraph and then "
                "the quick brown fox jumps over the lazy dog "
                "followed by much more unrelated trailing content "
                "that dilutes the whole document jaccard far below any "
                "fuzzy threshold while containment stays at one hundred percent",
            ),
            # fuzzy pass: whole-doc near-dup paraphrase (one token off →
            # containment 6/7 ≈ 0.857 < the 0.9 exact threshold, but
            # whole-doc jaccard 6/8 = 0.75 ≥ the 0.5 fuzzy threshold)
            (2, "the quick brown fox jumps over the lazy cat"),
            # clean
            (3, "completely different text with no shared phrases at all"),
        ],
    )
    kept = sorted(
        r.doc_id
        for r in decontaminated_corpus(
            corpus, bench, n=3, exact_threshold=0.9, fuzzy_threshold=0.5
        ).collect()
    )
    assert kept == [3]
    # fuzzy pass off: only the exact flag applies
    kept_exact_only = sorted(
        r.doc_id
        for r in decontaminated_corpus(
            corpus, bench, n=3, exact_threshold=0.9, fuzzy_threshold=None
        ).collect()
    )
    assert kept_exact_only == [2, 3]


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_decontaminated_corpus_batchwise_equals_global(spark):
    """The statelessness claim in the docstring: gating each micro-batch
    independently equals gating the union — the operator never compares
    corpus docs to each other."""
    from nlp_with_pyspark_spark.operators.decontam import decontaminated_corpus

    bench = _docs(spark, [(100, "pack my box with five dozen liquor jugs")])
    rows = [
        (1, "pack my box with five dozen liquor jugs indeed"),
        (2, "how vexingly quick daft zebras jump over fences"),
        (3, "pack my box with five dozen pickle jars instead"),
        (4, "sphinx of black quartz judge my vow again"),
    ]
    docs = _docs(spark, rows)
    whole = {
        r.doc_id
        for r in decontaminated_corpus(docs, bench, n=3, fuzzy_threshold=0.3).collect()
    }
    b1 = docs.where(F.col("doc_id") <= 2)
    b2 = docs.where(F.col("doc_id") > 2)
    per_batch = {
        r.doc_id
        for b in (b1, b2)
        for r in decontaminated_corpus(b, bench, n=3, fuzzy_threshold=0.3).collect()
    }
    assert whole == per_batch


def test_pii_scrub_golden(spark):
    from nlp_with_pyspark_spark.operators.textstats import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org today"),
            (2, "server 10.0.255.7 answered, call +1 (555) 010-9876 now"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (got[1].n_emails, got[1].n_ipv4, got[1].n_phones) == (1, 0, 0)
    assert (got[2].n_emails, got[2].n_ipv4, got[2].n_phones) == (0, 1, 1)
    assert (got[3].n_emails, got[3].n_ipv4, got[3].n_phones) == (0, 0, 0)
    # scrubbed hash changes only when something was scrubbed
    import hashlib

    assert got[3].scrubbed_md5 == hashlib.md5(b"no pii here at all").hexdigest()
    assert got[2].scrubbed_chars == len("server <IP> answered, call <PHONE> now")


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    from nlp_with_pyspark_spark.functions.vector import dequantize_error, quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    qz = quantize_int8(F.col("embedding"))
    out = df.select(
        "vec_id", qz.alias("qz"), dequantize_error(F.col("embedding"), qz).alias("er")
    ).collect()
    by_id = {r.vec_id: r for r in out}
    # scale = 1.0/127; codes = floor(x*127 + 0.5) clamped
    assert by_id[1].qz.q == [127, -63, 32, 0]
    assert by_id[1].qz.scale == pytest.approx(1 / 127)
    # max reconstruction error bounded by half a quantization step
    assert by_id[1].er.max_abs_err <= (1 / 127) * 0.5 + 1e-12
    assert by_id[2].qz.scale == 0.0
    assert by_id[2].qz.q == [0, 0, 0, 0]
    assert by_id[2].er.mse == 0.0


def test_canonical_corpus_keeps_representatives(spark):
    from nlp_with_pyspark_spark.operators.dedup import canonical_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], "doc_a long, doc_b long"
    )
    kept = sorted(r.doc_id for r in canonical_corpus(docs, pairs).collect())
    # clusters {1,3,5} -> keep 1; {2,4} -> keep 2; 0 untouched
    assert kept == [0, 1, 2]


def test_quantize_int8_property(spark):
    """Property (hypothesis-style grid): for any float32 vector, every
    reconstruction error is ≤ scale/2 + float eps, and codes stay in
    [-127, 127]."""
    import numpy as np

    from nlp_with_pyspark_spark.functions.vector import dequantize_error, quantize_int8

    rng = np.random.RandomState(7)
    vecs = [
        rng.uniform(-m, m, size=16).astype("float32").tolist()
        for m in (1e-3, 1.0, 50.0, 1e4)
    ] + [[0.0] * 16, [1e-30] * 16, [-5.0] + [0.0] * 15]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    qz = quantize_int8(F.col("embedding"))
    rows = df.select(
        "vec_id", qz.alias("qz"), dequantize_error(F.col("embedding"), qz).alias("er")
    ).collect()
    for r in rows:
        scale = r.qz.scale
        assert all(-127 <= c <= 127 for c in r.qz.q)
        assert r.er.max_abs_err <= scale / 2 + 1e-9 * max(1.0, scale), (
            r.vec_id, scale, r.er.max_abs_err,
        )


def test_strip_markup_semantics(spark):
    """Script/style bodies vanish entirely, tags become spaces, entities
    unescape single-pass (amp LAST: '&amp;lt;' -> '&lt;', never '<')."""
    from nlp_with_pyspark_spark.operators.textstats import strip_markup

    import pyspark.sql.functions as F

    rows = [
        (1, '<html><body><p>Hello <b>world</b></p></body></html>'),
        (2, 'before<script type="x">var a = "<p>not text</p>";</script>after'),
        (3, '<style>p { color: red; }</style>only this'),
        (4, 'a &amp;lt; b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39;'),
        (5, 'no markup   at  all'),
        (6, '<SCRIPT>UPPER();</SCRIPT>case-insensitive'),
    ]
    df = spark.createDataFrame(rows, ["i", "text"]).select(
        "i", strip_markup(F.col("text")).alias("t")
    )
    got = {r.i: r.t for r in df.collect()}
    assert got[1] == "Hello world"
    assert got[2] == "before after"
    assert got[3] == "only this"
    assert got[4] == 'a &lt; b & c <tag> "q" \'s\''
    assert got[5] == "no markup at all"
    assert got[6] == "case-insensitive"
