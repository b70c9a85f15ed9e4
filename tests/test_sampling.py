"""Deterministic hash-threshold sampling (operators/sampling.py).

Oracle parity (test_oracle_parity) already pins exact membership for
the registered queries; these tests pin the *operator contract* — the
properties a pipeline relies on, across both hash families:

  * partitioning-invariance (same rows kept under any repartition);
  * nesting (a 10 % sample contains the 5 % sample, same salt);
  * salt independence;
  * rate accuracy within binomial tolerance;
  * splits partition the input exactly;
  * stratified rate-1.0 keeps every row of the stratum (the 'g'
    threshold edge: an all-f 8-digit threshold would drop digests
    starting ffffffff).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nlp_with_pyspark_spark.operators.sampling import (
    group_safe_split,
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from nlp_with_pyspark_spark.sources.io import read_table

SF = "/root/testdata/sf0.01"


def _ids(df):
    return {r[0] for r in df.select("doc_id").collect()}


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_partitioning_invariance(docs, hash_fn):
    a = _ids(hash_sample(docs.repartition(3), 0.3, hash_fn=hash_fn))
    b = _ids(hash_sample(docs.repartition(17), 0.3, hash_fn=hash_fn))
    assert a == b and a


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_nesting(docs, hash_fn):
    small = _ids(hash_sample(docs, 0.05, hash_fn=hash_fn))
    big = _ids(hash_sample(docs, 0.10, hash_fn=hash_fn))
    assert small <= big


@pytest.mark.parametrize("hash_fn", ["md5", "xxhash64"])
def test_rate_accuracy(docs, hash_fn):
    n = docs.count()
    p = 0.25
    kept = hash_sample(docs, p, hash_fn=hash_fn).count()
    tol = 4 * math.sqrt(n * p * (1 - p))  # ±4σ binomial
    assert abs(kept - n * p) <= tol, (kept, n * p, tol)


def test_salt_independence(docs):
    a = _ids(hash_sample(docs, 0.3, salt="a"))
    b = _ids(hash_sample(docs, 0.3, salt="b"))
    assert a != b  # different coins
    # overlap ≈ 9% of corpus, not 0 and not 30%
    n = docs.count()
    assert 0 < len(a & b) < 0.2 * n


def test_rate_edges(docs):
    n = docs.count()
    assert hash_sample(docs, 1.0).count() == n
    assert hash_sample(docs, 0.0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(docs, 0.5, hash_fn="sha999")


def test_split_partitions_input(docs):
    out = hash_split(docs, {"train": 0.8, "valid": 0.1, "test": 0.1})
    n = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] - 0.8 * n) <= 4 * math.sqrt(n * 0.16)
    # stable under repartition
    a = {(r["doc_id"], r["split"]) for r in out.collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(docs.repartition(7), {"train": 0.8, "valid": 0.1, "test": 0.1}).collect()
    }
    assert a == b


def test_split_fractions_must_sum(docs):
    with pytest.raises(ValueError):
        hash_split(docs, {"train": 0.8, "test": 0.1})


FR = {"train": 0.8, "valid": 0.1, "test": 0.1}


def _prefix_keyed(docs):
    """(doc_id, grp): md5 of the first-16-token prefix — the registered
    query's fingerprint, which has multi-doc groups at every SF (the
    corpus's planted near-dups share prefixes; exact body dups only
    appear at sf0.1)."""
    from nlp_with_pyspark_spark.functions.text import tokens_pipeline

    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(tokens_pipeline(F.col("text")), 1, 16))).alias(
            "grp"
        ),
    )


def test_group_safe_split_never_straddles(docs):
    out = group_safe_split(_prefix_keyed(docs), FR, group_col="grp")
    # every body-hash group maps to exactly one split label
    per_group = out.groupBy("grp").agg(F.count_distinct("split").alias("k"))
    assert per_group.where("k > 1").count() == 0
    # the corpus has real multi-doc dup groups, so the guarantee bites
    assert out.groupBy("grp").count().where("count > 1").count() > 0


def test_group_safe_split_matches_hash_split_on_rep(docs):
    """Singleton groups get exactly hash_split's label, and every row
    gets the label hash_split would give its group representative —
    group membership is the ONLY behavioral difference."""
    keyed = _prefix_keyed(docs)
    ours = {
        (r["doc_id"], r["split"])
        for r in group_safe_split(keyed, FR, group_col="grp").collect()
    }
    rep = {
        r["doc_id"]: r["rep"]
        for r in group_safe_split(keyed, FR, group_col="grp").collect()
    }
    plain = {
        r["doc_id"]: r["split"] for r in hash_split(docs, FR).collect()
    }
    assert ours == {(d, plain[rep[d]]) for d in rep}


def test_group_safe_split_single_shuffle(docs):
    """The whole labeling costs ONE Exchange (the group-key window) —
    no corpus-sized join-back, no second shuffle for the draw."""
    out = group_safe_split(_prefix_keyed(docs), FR, group_col="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_shuffles = sum(
        1 for line in plan.splitlines() if "Exchange hashpartitioning" in line
    )
    assert n_shuffles == 1, plan


def test_stratified_rate_one_keeps_all(docs):
    out = stratified_hash_sample(docs, rates={"zh": 1.0}, strata_col="lang", default_rate=0.0)
    assert out.count() == docs.where("lang = 'zh'").count()
    assert out.where("lang <> 'zh'").count() == 0


def test_sampling_filter_reaches_scan(docs):
    """The md5 threshold filter must sit in the scan stage — no shuffle
    anywhere in the sampled plan (scan-speed at 100 TB)."""
    plan = hash_sample(docs, 0.25)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_deterministic_and_partition_invariant(docs, spark):
    from nlp_with_pyspark_spark.operators.sampling import deterministic_shuffle

    ids = docs.select("doc_id")
    a = {(r.doc_id, r.shard, r.pos) for r in deterministic_shuffle(ids).collect()}
    b = {
        (r.doc_id, r.shard, r.pos)
        for r in deterministic_shuffle(ids.repartition(7)).collect()
    }
    assert a == b and a  # same permutation under any input partitioning


def test_shuffle_new_seed_is_new_permutation(docs):
    from nlp_with_pyspark_spark.operators.sampling import deterministic_shuffle

    ids = docs.select("doc_id")
    e0 = {r.doc_id: (r.shard, r.pos) for r in deterministic_shuffle(ids, "epoch-0").collect()}
    e1 = {r.doc_id: (r.shard, r.pos) for r in deterministic_shuffle(ids, "epoch-1").collect()}
    assert set(e0) == set(e1)  # same docs...
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > 0.9 * len(e0)  # ...nearly all at new addresses


def test_shuffle_addresses_are_dense_and_uniform(docs):
    """(shard, pos) is a valid address space: every shard 0..n-1
    present, pos contiguous 1..|shard| within each, shard sizes within
    binomial noise of uniform."""
    from collections import defaultdict

    from nlp_with_pyspark_spark.operators.sampling import deterministic_shuffle

    n_shards = 8
    rows = deterministic_shuffle(docs.select("doc_id"), n_shards=n_shards).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r.pos)
    assert set(by_shard) == set(range(n_shards))
    total = len(rows)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {s} pos not dense"
        # 5-sigma binomial bound around total/n
        mean = total / n_shards
        sigma = math.sqrt(total * (1 / n_shards) * (1 - 1 / n_shards))
        assert abs(len(ps) - mean) < 5 * sigma, (s, len(ps), mean)


def test_shuffle_single_exchange(docs):
    """The 100 TB claim: the whole permutation costs ONE shuffle (the
    rank window's hash partition on shard)."""
    from nlp_with_pyspark_spark.operators.sampling import deterministic_shuffle
    from nlp_with_pyspark_spark.plans.inspect import plan_string

    out = deterministic_shuffle(docs.select("doc_id"))
    plan = plan_string(out)
    n_ex = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert n_ex == 1, plan


def test_shuffle_payload_rides_along(docs):
    """payload_cols ride the one shuffle (no join-back): the addressed
    output carries the payload values unchanged."""
    from nlp_with_pyspark_spark.operators.sampling import deterministic_shuffle

    out = deterministic_shuffle(
        docs.select("doc_id", "lang", "n_chars"), payload_cols=["lang", "n_chars"]
    )
    got = {r.doc_id: (r.lang, r.n_chars) for r in out.collect()}
    want = {r.doc_id: (r.lang, r.n_chars) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    assert got == want


def test_group_safe_split_refuses_output_column_collision(docs):
    """withColumn replaces on name collision — the operator must refuse
    to silently overwrite a caller's existing 'rep' or 'split' column."""
    import pytest
    from pyspark.sql import functions as F

    keyed = _prefix_keyed(docs)
    with pytest.raises(ValueError, match="rep"):
        group_safe_split(keyed.withColumn("rep", F.lit(0)), FR, group_col="grp")
    with pytest.raises(ValueError, match="split"):
        group_safe_split(
            keyed.withColumn("split", F.lit("x")), FR, group_col="grp"
        )
