"""Round-4 operators: n-gram counts, centroid top-k, subquery shapes,
max_by latest-state — unit edge cases + the plan shapes that decide
scale behavior (oracle parity is covered by test_oracle_parity)."""

import pyspark.sql.functions as F
import pytest

from nlp_with_pyspark_spark.operators import relational
from nlp_with_pyspark_spark.operators.similarity import centroid_topk
from nlp_with_pyspark_spark.operators.vocab import ngram_counts, top_k_ngrams
from nlp_with_pyspark_spark.plans import final_plan_string
from nlp_with_pyspark_spark.sources.io import read_table


# ---------------------------------------------------------------------------
# ngram_counts
# ---------------------------------------------------------------------------


def _toks_df(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "tokens: array<string>")


def test_ngram_short_rows_contribute_nothing(spark):
    """sequence(1, 0) DESCENDS in Spark — the when-guard must turn
    sub-n rows into zero n-grams, not a reversed window."""
    df = _toks_df(spark, [["a"], [], ["a", "b"]])
    got = {(r.ngram, r["count"]) for r in ngram_counts(df, n=2).collect()}
    assert got == {("a b", 1)}


def test_ngram_counts_overlapping_windows(spark):
    df = _toks_df(spark, [["x", "y", "x", "y"]])
    got = {(r.ngram, r["count"]) for r in ngram_counts(df, n=2).collect()}
    assert got == {("x y", 2), ("y x", 1)}


def test_trigram_counts(spark):
    df = _toks_df(spark, [["a", "b", "c", "d"]])
    got = {(r.ngram, r["count"]) for r in ngram_counts(df, n=3).collect()}
    assert got == {("a b c", 1), ("b c d", 1)}


def test_top_k_ngrams_tiebreak_pinned(spark):
    # equal counts -> lexicographic ngram ASC decides the cut
    df = _toks_df(spark, [["b", "c"], ["a", "b"]])
    rows = top_k_ngrams(df, k=1, n=2).collect()
    assert [(r.ngram, r["count"]) for r in rows] == [("a b", 1)]


# ---------------------------------------------------------------------------
# centroid_topk
# ---------------------------------------------------------------------------


def test_centroid_topk_exact_small(spark):
    # centroid of [1,0],[0,1] is [.5,.5]; [3,3] is perfectly aligned
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [3.0, 3.0])],
        "vec_id: long, embedding: array<double>",
    )
    rows = centroid_topk(df, k=3).collect()
    assert rows[0].vec_id == 3 and rows[0].cos_centroid == pytest.approx(1.0)
    # the two axis vectors tie at cos 0.7071..; vec_id ASC breaks it
    assert [r.vec_id for r in rows[1:]] == [1, 2]


def test_centroid_is_broadcast_not_shuffled(spark, sf_dir):
    spark.catalog.clearCache()
    q = centroid_topk(read_table(spark, sf_dir, "embeddings"), k=5)
    q.collect()
    plan = final_plan_string(q)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


# ---------------------------------------------------------------------------
# subquery shapes: decorrelated Q17 / scalar Q22
# ---------------------------------------------------------------------------


def test_small_qty_plan_no_fact_shuffle_join(spark, sf_dir):
    """Both lineitem scans must be reduced via broadcast hash joins —
    a SortMergeJoin on the fact table means the decorrelation broke."""
    spark.catalog.clearCache()
    q = relational.small_qty_part_revenue(
        read_table(spark, sf_dir, "lineitem"), read_table(spark, sf_dir, "part")
    )
    q.collect()
    plan = final_plan_string(q)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_high_balance_inactive_matches_manual(spark, sf_dir):
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    got = {
        (r.c_mktsegment, r.n_custs)
        for r in relational.high_balance_inactive(customer, orders).collect()
    }
    import datetime

    avg_bal = round(
        customer.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0], 6
    )
    active = {
        r.o_custkey
        for r in orders.where(
            F.col("o_orderdate") >= datetime.datetime(2001, 1, 1)
        ).select("o_custkey").collect()
    }
    manual = {}
    for r in customer.collect():
        if r.c_acctbal > avg_bal and r.c_custkey not in active:
            manual[r.c_mktsegment] = manual.get(r.c_mktsegment, 0) + 1
    assert got == set(manual.items())


# ---------------------------------------------------------------------------
# latest_event_per_user (max_by)
# ---------------------------------------------------------------------------


def test_max_by_no_window_sort_in_plan(spark, sf_dir):
    """max_by compiles to a hash aggregate with map-side partials — a
    Window/row_number formulation would full-sort every event instead."""
    from nlp_with_pyspark_spark.queries import QUERIES

    spark.catalog.clearCache()
    q = QUERIES["latest_event_per_user"](spark, sf_dir)
    q.collect()
    plan = final_plan_string(q)
    assert "Window" not in plan, plan
    assert "max_by" in plan or "HashAggregate" in plan, plan


def test_latest_event_matches_manual(spark, sf_dir):
    from nlp_with_pyspark_spark.queries import QUERIES

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts_ns", "event_id", "event_type").collect()
    best = {}
    for r in ev:
        key = (r.ts_ns // 1000, r.event_id)
        if r.user_id not in best or key > best[r.user_id][0]:
            best[r.user_id] = (key, r.event_type)
    got = {
        (r.user_id, r.last_type, r.last_ts_us)
        for r in QUERIES["latest_event_per_user"](spark, sf_dir).collect()
    }
    want = {(u, t, k[0]) for u, (k, t) in best.items()}
    # last_ts_us is max over ALL events while the champion is by (us, id);
    # same value because the per-user max microsecond belongs to the
    # champion row whenever microseconds are unique per user (they are in
    # the testdata; the pinned key keeps engines agreeing even if not)
    assert got == want


def test_pmi_collocations_matches_separate_count_frames(spark):
    """The single-pass tagged (n, gram) count restructure must score
    identically to an independent recomputation from the separate
    word_counts / ngram_counts frames — including when a literal
    bigram string collides with a token (the tag disambiguates) and
    when short/empty docs contribute nothing."""
    import math

    from nlp_with_pyspark_spark.operators.vocab import (
        pmi_collocations,
        word_counts,
    )

    rows = [
        (0, ["strong", "coffee", "strong", "coffee", "strong", "tea"]),
        (1, ["strong", "coffee", "black", "tea", "strong", "coffee"]),
        (2, ["strong coffee", "strong coffee", "black", "tea"]),  # collides
        (3, ["solo"]),                                            # no bigrams
        (4, []),                                                  # empty
        (5, ["black", "tea", "black", "tea", "black", "tea"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = [
        tuple(r)
        for r in pmi_collocations(docs, min_count=2, k=10).collect()
    ]

    # independent recomputation with plain python over the two frames
    uni = {r.word: r["count"] for r in word_counts(docs).collect()}
    bi = {r.ngram: r["count"] for r in ngram_counts(docs, n=2).collect()}
    n1 = sum(uni.values())
    n2 = sum(bi.values())
    want = []
    for g, cab in bi.items():
        if cab < 2:
            continue
        wa, wb = g.split(" ")[0], g.split(" ")[1]
        pmi = math.log(
            (cab / n2) / ((uni[wa] / n1) * (uni[wb] / n1))
        )
        want.append((g, cab, round(pmi, 6)))
    want.sort(key=lambda t: (-t[2], t[0]))
    assert got == want[:10]
    assert any(g == "strong coffee" for g, _, _ in got), "collision case present"
