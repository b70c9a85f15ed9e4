"""Hypothesis property tests (SURVEY §5: non-oracle correctness).

Each property runs a whole generated corpus through ONE Spark job per
example (row-at-a-time Spark calls would make hypothesis unusably slow).

The differential properties re-implement the operator in ~5 lines of
plain Python and require exact agreement — an independent model check,
complementing the DuckDB oracle which shares the SQL formulation.
"""

import pytest
import re

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nlp_with_pyspark_spark.functions.text import DEFAULT_STOPWORDS, tokens_pipeline
from nlp_with_pyspark_spark.operators.dedup import (
    minhash_candidate_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from nlp_with_pyspark_spark.operators.relational import money_sum

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDE @:/.0123456789  ",
    min_size=0,
    max_size=120,
)

token_lists = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=0, max_size=25
)


def _py_tokens(text: str) -> list[str]:
    """Independent Python model of tokens_pipeline (clean→split→stopfilter)."""
    s = text.lower()
    s = re.sub(r"(?:@|https?://)\S+", "", s)
    s = re.sub(r"[^a-z]", " ", s).lstrip()
    toks = [t for t in re.split(r"\s+", s) if t != ""]
    return [t for t in toks if t not in DEFAULT_STOPWORDS]


@settings(**SETTINGS)
@given(st.lists(texts, min_size=1, max_size=30))
def test_tokens_pipeline_matches_python_model(spark, corpus):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "id long, text string")
    got = {
        r.id: list(r.toks)
        for r in df.select("id", tokens_pipeline(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(corpus):
        assert got[i] == _py_tokens(t), f"text={t!r}"


@settings(**SETTINGS)
@given(
    st.lists(
        st.decimals(
            min_value=-99999, max_value=99999, places=2, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_money_sum_is_exact(spark, amounts):
    """decimal(18,2) accumulation must equal exact Decimal arithmetic —
    the partitioning-independence guarantee."""
    df = spark.createDataFrame([(float(a),) for a in amounts], "v double")
    got = df.repartition(7).agg(money_sum("v", "s")).first()["s"]
    assert got == float(sum(amounts))


@settings(**SETTINGS)
@given(st.lists(token_lists, min_size=2, max_size=15), st.data())
def test_exact_duplicates_always_minhash_candidates(spark, lists, data):
    """Identical token lists have identical signatures ⇒ every band
    matches ⇒ the pair MUST be a candidate (LSH false-negative-free for
    exact dups)."""
    # duplicate one eligible list (needs ≥3 tokens to have shingles)
    eligible = [l for l in lists if len(l) >= 3]
    if not eligible:
        return
    dup = data.draw(st.sampled_from(eligible))
    rows = [(i, l) for i, l in enumerate(lists)] + [(len(lists), dup)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(df).collect()
    }
    a = lists.index(dup)
    assert (a, len(lists)) in pairs


event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=20),  # ts (seconds; small range forces ties)
        st.sampled_from(["click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(event_rows)
def test_asof_join_matches_python_model(spark, rows):
    """asof_join_events vs a direct Python model, exercising the edge
    semantics synthetic testdata rarely hits: exact ts ties (click at
    purchase time MUST match), multiple clicks at one ts, and purchases
    with no prior click (null match)."""
    from nlp_with_pyspark_spark.operators.windows import asof_join_events

    data = [
        (i, int(u), int(t) * 1_000_000_000, typ, 0.0, "{}")
        for i, (u, t, typ) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts_ns long, event_type string, value double, props string"
    )
    got = {
        r.event_id: (r.left_sec, r.right_sec, r.gap_sec)
        for r in asof_join_events(df, "purchase", "click").collect()
    }
    purchases = [(i, u, t) for i, (u, t, typ) in enumerate(rows) if typ == "purchase"]
    clicks = [(u, t) for (u, t, typ) in rows if typ == "click"]
    assert set(got) == {i for i, _, _ in purchases}
    for i, u, t in purchases:
        prior = [ct for cu, ct in clicks if cu == u and ct <= t]
        want = max(prior) if prior else None
        left, right, gap = got[i]
        assert left == t
        assert right == want
        assert gap == (t - want if want is not None else None)


@settings(**SETTINGS)
@given(st.lists(token_lists.filter(lambda l: len(l) >= 1), min_size=2, max_size=12))
@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_simhash_banding_exact_below_bands(spark, lists):
    """Pigeonhole guarantee: with max_hamming < bands, banded blocking
    finds EXACTLY the pairs with hamming ≤ max_hamming — no false
    negatives."""
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lists)], "doc_id long, tokens array<string>"
    )
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()}
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_pairs(df, max_hamming=3, bands=4).collect()
    }
    want = set()
    ids = sorted(fps)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = sum(x != y for x, y in zip(fps[ids[i]], fps[ids[j]]))
            if ham <= 3:
                want.add((ids[i], ids[j]))
    assert got == want


def test_auc_bucketed_tracks_exact_and_sklearn_free_model(spark):
    """Differential check of both AUC paths against a 5-line Python
    reference on a signal-bearing score distribution, plus the
    bucketed-vs-exact resolution bound (≤ 2/n_buckets)."""
    import itertools

    from nlp_with_pyspark_spark.operators.metrics import (
        binary_auc_bucketed,
        binary_auc_exact,
    )

    # deterministic scores with real signal + engineered ties
    rows = []
    for i in range(300):
        y = i % 2
        base = 0.62 if y else 0.38
        rows.append((round(base + ((i * 37) % 100 - 50) / 250.0, 3), y))
    df = spark.createDataFrame(rows, ["score", "y"])

    # independent reference: P(score_pos > score_neg) + 0.5 P(tie)
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        for sp, sn in itertools.product(pos, neg)
    )
    ref = wins / (len(pos) * len(neg))

    exact = binary_auc_exact(df, "score", "y").collect()[0]
    assert exact.n_pos == len(pos) and exact.n_neg == len(neg)
    assert abs(exact.auc - ref) < 1e-6, (exact.auc, ref)

    bucketed = binary_auc_bucketed(df, "score", "y", n_buckets=1000).collect()[0]
    assert abs(bucketed.auc - exact.auc) <= 2 / 1000, (bucketed.auc, exact.auc)
