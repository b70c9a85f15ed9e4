"""Property tests for the non-oracle-able paths (SURVEY §5):
LSH ANN recall vs the exact baseline; dedup invariants."""

import pyspark.sql.functions as F
import pytest

from nlp_with_pyspark_spark.functions.text import tokens_pipeline
from nlp_with_pyspark_spark.operators.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from nlp_with_pyspark_spark.operators.similarity import brute_force_topk, lsh_topk
from nlp_with_pyspark_spark.sources.io import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "documents")
        .withColumn("tokens", tokens_pipeline(F.col("text")))
        .cache()
    )


def test_lsh_recall_vs_brute_force(emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=10)
    # 4 planes = 16 coarse buckets: on near-orthogonal synthetic vectors
    # only coarse buckets retain signal (real embedding corpora cluster,
    # so production defaults use more planes)
    approx = lsh_topk(emb, queries, k=10, n_planes=4, dim=64)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # sign-LSH with 6 planes + multiprobe on near-orthogonal vectors is a
    # weak filter, but must beat random chance by a wide margin:
    # random 10-of-n recall ≈ 10/n ≈ 2%.
    assert recall > 0.2, f"LSH recall {recall:.2%} barely above chance"


def test_ivf_recall_vs_brute_force(emb):
    from nlp_with_pyspark_spark.operators.similarity import ivf_topk

    queries = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_lists=8, n_probe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing half the lists (4/8) must recover well over half the true
    # neighbors; random 10-of-n recall is ~2%
    assert recall > 0.4, f"IVF recall {recall:.2%}"


def test_ivf_deterministic(emb):
    from nlp_with_pyspark_spark.operators.similarity import ivf_topk

    queries = emb.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(emb, queries, k=10).collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=10).collect()))
    assert a == b


def test_ivf_prebuilt_index_matches_inline(emb):
    """Build-once/query-many must equal the inline convenience form, and
    the prebuilt index must serve multiple query batches."""
    from nlp_with_pyspark_spark.operators.similarity import (
        build_ivf_index,
        ivf_query,
        ivf_topk,
    )

    assignments, centroids = build_ivf_index(emb, n_lists=8)
    assignments = assignments.cache()
    q1 = emb.where(F.col("vec_id") < 5)
    got = sorted(map(tuple, ivf_query(assignments, centroids, q1, k=10, n_probe=4).collect()))
    want = sorted(map(tuple, ivf_topk(emb, q1, k=10, n_lists=8, n_probe=4).collect()))
    assert got == want
    q2 = emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    batch2 = ivf_query(assignments, centroids, q2, k=10, n_probe=4).collect()
    assert {r.query_id for r in batch2} == {5, 6, 7, 8, 9}


def test_lsh_subset_of_scored_universe(emb):
    queries = emb.where(F.col("vec_id") < 5)
    approx = lsh_topk(emb, queries, k=10, n_planes=6, dim=64)
    rows = approx.collect()
    assert all(r.rank >= 1 and r.rank <= 10 for r in rows)
    assert all(r.query_id != r.neighbor_id for r in rows)


def test_exact_dedup_keeps_one_per_content(spark, docs):
    deduped = exact_dedup(docs)
    n_distinct_texts = docs.select("text").distinct().count()
    assert deduped.count() == n_distinct_texts
    # idempotent
    assert exact_dedup(deduped).count() == n_distinct_texts


def test_minhash_candidates_superset_of_high_jaccard(docs):
    """Every pair with very high exact Jaccard should be an LSH candidate
    (probabilistic, but ≥0.9 Jaccard with 4 bands of r=3 collides with
    prob 1-(1-0.9^3)^4 ≈ 0.995 per pair)."""
    exact_hi = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    if not exact_hi:
        pytest.skip("no ≥0.9-Jaccard pairs at this sf")
    cands = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs, k=12, bands=4).collect()
    }
    missed = exact_hi - cands
    assert len(missed) <= max(1, len(exact_hi) // 10), f"LSH missed {missed}"


def test_simhash_near_pairs_symmetric_bounded(docs):
    pairs = simhash_near_pairs(docs, max_hamming=8).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)
    assert all(0 <= r.hamming <= 8 for r in pairs)


def test_simhash_near_pairs_rejects_lossy_configs(docs):
    # bands <= max_hamming: differing bits can touch every segment
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(docs, max_hamming=16, bands=4)
    # combo_size > bands - max_hamming: no guaranteed shared key
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(docs, max_hamming=4, bands=6, combo_size=3)
    # > 64 segments would be empty strings
    with pytest.raises(ValueError, match="64"):
        simhash_near_pairs(docs, max_hamming=63, bands=65)


def test_simhash_combo_equals_pigeonhole_blocking(docs):
    """Both blockings are lossless for the advertised radius, so they
    must produce the identical verified pair set."""
    combo = simhash_near_pairs(docs, max_hamming=4)  # bands=7, combo_size=3
    pigeon = simhash_near_pairs(docs, max_hamming=4, bands=5, combo_size=1)
    assert sorted(map(tuple, combo.collect())) == sorted(map(tuple, pigeon.collect()))


def test_bucket_pairs_drops_hot_buckets(spark):
    """The max_docs_per_bucket skew guard: an over-cap bucket (mass
    duplication) contributes no pairs; other buckets are unaffected."""
    from nlp_with_pyspark_spark.operators.dedup import _bucket_pairs

    hot = [(i, 0, "hot") for i in range(12)]
    ok = [(100, 1, "ok"), (101, 1, "ok")]
    bb = spark.createDataFrame(hot + ok, "doc_id long, band_id int, band_hash string")
    got = sorted(map(tuple, _bucket_pairs(bb, max_docs_per_bucket=10).collect()))
    assert got == [(100, 101)]


def test_minhash_cap_drops_mass_duplicate_cluster(spark):
    """End-to-end: a cluster of identical docs larger than the cap emits
    no candidates, while a distinct near-dup pair still does."""
    clones = [(i, ["mass", "duplicate", "boilerplate", "text", "block"]) for i in range(8)]
    pair = [(i, ["a", "small", "distinct", "duplicate", "pair"]) for i in (100, 101)]
    docs = spark.createDataFrame(clones + pair, "doc_id long, tokens array<string>")
    got = sorted(
        map(tuple, minhash_candidate_pairs(docs, max_docs_per_bucket=5).collect())
    )
    assert got == [(100, 101)]


def test_minhash_xxhash64_production_family(docs):
    """hash_fn='xxhash64' (the production path: native 64-bit longs, no
    hex digests) is a valid minhash family: the verified near-dup pairs
    on the synthetic corpus match the oracle-parity md5 family, and the
    band keys in flight are longs, not 32-char strings."""
    from nlp_with_pyspark_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_dedup_pairs,
    )

    md5_pairs = sorted(
        map(tuple, minhash_dedup_pairs(docs, threshold=0.7).collect())
    )
    xx_pairs = sorted(
        map(tuple, minhash_dedup_pairs(docs, threshold=0.7, hash_fn="xxhash64").collect())
    )
    assert xx_pairs == md5_pairs
    bb = lsh_band_buckets(docs, hash_fn="xxhash64")
    assert dict(bb.dtypes)["band_hash"] == "bigint"
    with pytest.raises(ValueError, match="hash_fn"):
        minhash_dedup_pairs(docs, hash_fn="fnv")


def test_simhash_xxhash64_production_family(docs):
    """hash_fn='xxhash64' simhash: one native hash per token, bits read
    straight off the long. Different family ⇒ different fingerprints
    than md5, but the simhash CONTRACT holds: valid 64-char bitstrings,
    deterministic, identical docs collide exactly, and near-pair search
    still finds the corpus's near-dup structure."""
    from nlp_with_pyspark_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_pairs,
    )

    fp = simhash_fingerprints(docs, hash_fn="xxhash64").collect()
    assert fp and all(
        len(r.simhash) == 64 and set(r.simhash) <= {"0", "1"} for r in fp
    )
    again = simhash_fingerprints(docs, hash_fn="xxhash64").collect()
    assert sorted(map(tuple, fp)) == sorted(map(tuple, again))

    # the family-independent guarantee: identical DISTINCT-token sets ⇒
    # identical fingerprint ⇒ Hamming 0 ⇒ found (blocking is lossless).
    # (Borderline pairs at 1..max_hamming legitimately differ between
    # hash families — Hamming(fp) is a per-family estimator of token-set
    # similarity, not a corpus invariant.)
    same_sets = (
        docs.select("doc_id", F.array_sort(F.array_distinct("tokens")).alias("ts"))
        .where(F.size("ts") > 0)
        .groupBy("ts")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .collect()
    )
    want = {
        (ids[i], ids[j])
        for r in same_sets
        for ids in [r.ids]
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
    }
    xx_pairs = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(docs, max_hamming=3, hash_fn="xxhash64").collect()
    }
    found0 = {(a, b) for a, b, h in xx_pairs if h == 0}
    assert want, "fixture should contain at least one identical-token pair"
    assert want <= found0, want - found0
    with pytest.raises(ValueError, match="hash_fn"):
        simhash_fingerprints(docs, hash_fn="sha1")


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_xxhash64_families_interchangeable_at_driver_scale(spark):
    """End-to-end pin that the PRODUCTION hash family (xxhash64 — the
    one a 100 TB run uses, since md5-hex exists for DuckDB oracle
    parity) is interchangeable with the checked md5 family on the
    driver-scale corpus (sf0.01, ~5k docs):

    * minhash: the exact-Jaccard verify makes pair sets family-
      independent up to banding luck — require recall 1.0 both ways;
    * simhash: the fingerprint IS the metric, so pair sets legitimately
      differ between families — require both families to recover the
      same share (±1 pair) of the GROUND-TRUTH pairs (exact 3-gram
      Jaccard ≥ 0.7 via the quadratic verifier), i.e. the production
      family loses no real duplicates vs the oracle family.
    """
    from nlp_with_pyspark_spark.operators.dedup import minhash_dedup_pairs
    from nlp_with_pyspark_spark.queries import _tokenized_documents

    from .conftest import SF_DIR_ORACLE

    docs = (
        _tokenized_documents(spark, SF_DIR_ORACLE)
        .select("doc_id", "tokens")
        .localCheckpoint()
    )

    md5_mh = {(r.doc_a, r.doc_b) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    xx_mh = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(docs, threshold=0.5, hash_fn="xxhash64").collect()
    }
    assert md5_mh, "corpus produced no minhash pairs — recall test is vacuous"
    assert xx_mh == md5_mh

    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()}
    assert truth, "corpus produced no ground-truth pairs"
    md5_sh = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(docs).collect()}
    xx_sh = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(docs, hash_fn="xxhash64").collect()}
    md5_hits = len(truth & md5_sh)
    xx_hits = len(truth & xx_sh)
    # measured at round 6: truth=25, md5 recovers 21, xxhash64 20
    assert md5_hits / len(truth) >= 0.75
    assert xx_hits >= md5_hits - 1, (
        f"production family lost real duplicates: md5={md5_hits} xx={xx_hits} of {len(truth)}"
    )


def test_dup_ngram_coverage_interval_union(spark):
    """Overlapping duplicated n-grams must be counted ONCE per position
    (interval union), not once per n-gram — the operator's whole point
    vs a naive per-gram sum."""
    from nlp_with_pyspark_spark.operators.dedup import duplicated_ngram_coverage

    shared = "alpha bravo charlie delta echo foxtrot"  # 6 tokens = two 5-grams
    rows = [
        (1, f"{shared} golf hotel india juliet"),        # 10 tokens
        (2, f"kilo lima mike november {shared}"),        # 10 tokens
        (3, "oscar papa quebec romeo sierra tango"),     # no dup grams
        (4, "uniform victor whiskey"),                   # shorter than n
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "tokens", F.split("text", " ")
    )
    out = {
        r.doc_id: r
        for r in duplicated_ngram_coverage(docs, n=5, min_df=2).collect()
    }
    # both docs: 2 overlapping 5-grams covering 6 positions, not 10
    for d in (1, 2):
        assert out[d].n_dup_ngrams == 2
        assert out[d].dup_coverage == pytest.approx(0.6)
    assert out[3].n_dup_ngrams == 0 and out[3].dup_coverage == 0.0
    assert out[4].n_tokens == 3 and out[4].n_dup_ngrams == 0


def test_dup_ngram_coverage_gap_and_disjoint_spans(spark):
    """Two DISJOINT duplicated spans in one doc sum their union lengths."""
    from nlp_with_pyspark_spark.operators.dedup import duplicated_ngram_coverage

    a = "a1 a2 a3 a4 a5"   # 5 tokens, one 5-gram
    b = "b1 b2 b3 b4 b5"
    rows = [
        (1, f"{a} x1 x2 x3 {b}"),  # 13 tokens; dup spans at 0-4 and 8-12
        (2, a),
        (3, b),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "tokens", F.split("text", " ")
    )
    out = {
        r.doc_id: r
        for r in duplicated_ngram_coverage(docs, n=5, min_df=2).collect()
    }
    assert out[1].n_dup_ngrams == 2
    assert out[1].dup_coverage == pytest.approx(10 / 13, abs=1e-6)
    assert out[2].dup_coverage == pytest.approx(1.0)


def test_dup_ngram_coverage_hash_families_agree(docs):
    """Coverage depends only on gram EQUALITY, so the md5 (oracle) and
    xxhash64 (production) families must return identical tables on a
    real corpus — the scale path is provably a drop-in."""
    from nlp_with_pyspark_spark.operators.dedup import duplicated_ngram_coverage

    base = docs.select("doc_id", "tokens").localCheckpoint()
    md5_rows = sorted(
        duplicated_ngram_coverage(base, n=5, min_df=2).collect()
    )
    xx_rows = sorted(
        duplicated_ngram_coverage(base, n=5, min_df=2, hash_fn="xxhash64").collect()
    )
    assert md5_rows == xx_rows
    assert any(r.n_dup_ngrams > 0 for r in md5_rows), "corpus has no dup grams — vacuous"


def test_domain_mixture_weights_properties(docs):
    from nlp_with_pyspark_spark.operators.sampling import domain_mixture_weights

    rows = domain_mixture_weights(docs, group_col="source", weight_cap=5.0).collect()
    assert len(rows) > 1
    assert sum(r.token_share for r in rows) == pytest.approx(1.0, abs=1e-6)
    target = 1.0 / len(rows)
    for r in rows:
        assert 0 < r.mixture_weight <= 5.0
        # uncapped weights move the domain exactly to the uniform target
        if r.mixture_weight < 5.0:
            assert r.mixture_weight * r.token_share == pytest.approx(target, rel=1e-4)


def test_pq_trained_codebooks_beat_fixed(emb):
    """The production k-means codebooks (pq_train) must reconstruct the
    corpus strictly better than the fixed md5 codebooks the oracle path
    uses — i.e. the non-oracle-able seam actually earns its keep."""
    from nlp_with_pyspark_spark.operators.similarity import (
        pq_encode,
        pq_fixed_codebooks,
        pq_train,
    )

    fixed_mse = (
        pq_encode(emb, pq_fixed_codebooks())
        .agg(F.avg("d2").alias("mse"))
        .collect()[0]
        .mse
    )
    trained_mse = (
        pq_encode(emb, pq_train(emb, m=8, ksub=4, dim=64))
        .agg(F.avg("d2").alias("mse"))
        .collect()[0]
        .mse
    )
    assert trained_mse < fixed_mse, (trained_mse, fixed_mse)


def test_pq_codes_shape_and_determinism(emb):
    from nlp_with_pyspark_spark.operators.similarity import (
        pq_encode,
        pq_fixed_codebooks,
    )

    n_vec = emb.count()
    out = pq_encode(emb, pq_fixed_codebooks())
    rows = out.collect()
    assert len(rows) == n_vec * 8
    assert all(0 <= r.code < 4 and 0 <= r.subspace < 8 and r.d2 >= 0 for r in rows)
    # re-run is bit-identical (the codebooks are literals, not RNG state)
    assert sorted(rows) == sorted(out.collect())


def test_pq_adc_distance_equals_reconstruction_distance(emb):
    """The ADC identity that makes PQ search trustworthy: the fold over
    per-subspace LUT lookups must equal the true squared distance to the
    candidate's reconstruction, computed independently in Python."""
    import numpy as np

    from nlp_with_pyspark_spark.operators.similarity import (
        pq_adc_topk,
        pq_codes_wide,
        pq_fixed_codebooks,
    )

    cbs = pq_fixed_codebooks()
    codes = pq_codes_wide(emb, cbs)
    queries = emb.where(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.neighbor_id): r.adc_d2
        for r in pq_adc_topk(codes, queries, cbs, k=5).collect()
    }
    assert got, "no ADC results"
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    code_map = {r.vec_id: list(r.codes) for r in codes.collect()}
    dsub = len(cbs[0][0])
    for (qid, nid), adc in got.items():
        recon = np.concatenate([np.array(cbs[s][c]) for s, c in enumerate(code_map[nid])])
        true_d2 = float(((vecs[qid] - recon) ** 2).sum())
        assert abs(adc - round(true_d2, 6)) < 1e-5, (qid, nid, adc, true_d2)


def test_pq_adc_ranking_beats_random(emb):
    """ADC top-k must surface genuinely closer vectors: the mean TRUE
    distance of each query's ADC top-10 must beat the corpus mean."""
    import numpy as np

    from nlp_with_pyspark_spark.operators.similarity import (
        pq_adc_topk,
        pq_codes_wide,
        pq_train,
    )

    cbs = pq_train(emb, m=8, ksub=4, dim=64)
    codes = pq_codes_wide(emb, cbs)
    queries = emb.where(F.col("vec_id") < 5)
    top = pq_adc_topk(codes, queries, cbs, k=10).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    for qid in {r.query_id for r in top}:
        hits = [r.neighbor_id for r in top if r.query_id == qid]
        d_hits = np.mean([((vecs[qid] - vecs[n]) ** 2).sum() for n in hits])
        d_all = np.mean(
            [((vecs[qid] - v) ** 2).sum() for i, v in vecs.items() if i != qid]
        )
        assert d_hits < d_all, (qid, d_hits, d_all)


def test_dedup_lines_drops_boilerplate_preserves_order(spark):
    from nlp_with_pyspark_spark.operators.dedup import dedup_lines

    boiler = "subscribe now"
    rows = [
        (1, f"{boiler}\nunique one\nmiddle line\nunique two"),
        (2, f"other text\n{boiler}"),
        (3, f"{boiler}"),                    # nothing survives
        (4, "standalone body"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup_lines(docs, min_df=2).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1: boilerplate dropped, remaining lines keep original order
    assert out[1].n_lines == 4 and out[1].n_dropped == 1
    assert out[1].clean_md5 == md5("unique one\nmiddle line\nunique two")
    assert out[2].clean_md5 == md5("other text")
    # all copies of a duplicated line drop (C4 rule) — doc 3 empties out
    assert out[3].n_dropped == 1 and out[3].clean_md5 == md5("")
    assert out[4].n_dropped == 0 and out[4].clean_md5 == md5("standalone body")


def test_dedup_lines_hash_families_agree(spark):
    from nlp_with_pyspark_spark.operators.dedup import dedup_lines

    rows = [(i, f"shared header\nbody {i}\nshared footer") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(dedup_lines(docs, min_df=2).collect())
    b = sorted(dedup_lines(docs, min_df=2, hash_fn="xxhash64").collect())
    assert a == b
    assert all(r.n_dropped == 2 for r in a)


def test_ivfpq_full_probe_equals_plain_adc(emb):
    """IVF must PRUNE candidates, never change scores: probing every
    list must reproduce plain ADC search row-for-row."""
    from nlp_with_pyspark_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
        pq_codes_wide,
        pq_fixed_codebooks,
    )

    cbs = pq_fixed_codebooks()
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    queries = emb.where(F.col("vec_id") < 5)
    full = sorted(
        tuple(r)
        for r in ivfpq_topk(
            emb, queries, cents, cbs, k=5, n_probe=len(cents)
        ).collect()
    )
    plain = sorted(
        tuple(r) for r in pq_adc_topk(pq_codes_wide(emb, cbs), queries, cbs, k=5).collect()
    )
    assert full == plain and full


def test_ivfpq_pruned_probe_is_subset_with_same_scores(emb):
    """With n_probe < n_lists the result ranks a SUBSET of candidates —
    every returned pair must carry the same ADC distance as plain ADC."""
    from nlp_with_pyspark_spark.operators.similarity import (
        ivfpq_topk,
        pq_adc_topk,
        pq_codes_wide,
        pq_fixed_codebooks,
    )

    cbs = pq_fixed_codebooks()
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    queries = emb.where(F.col("vec_id") < 5)
    pruned = ivfpq_topk(emb, queries, cents, cbs, k=5, n_probe=2).collect()
    plain = {
        (r.query_id, r.neighbor_id): r.adc_d2
        for r in pq_adc_topk(pq_codes_wide(emb, cbs), queries, cbs, k=len(
            emb.collect()
        )).collect()
    }
    assert pruned
    for r in pruned:
        assert plain[(r.query_id, r.neighbor_id)] == r.adc_d2


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def _sem_centroids(emb, n_lists=8):
    return [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < n_lists)
        .select("vec_id", "embedding")
        .collect()
    ]


def test_semantic_pairs_equal_brute_force_restricted_to_clusters(emb):
    """The cluster restriction is the ONLY approximation: semantic pairs
    == exact all-pairs cosine pairs filtered to co-clustered endpoints
    (same threshold, same rounding). Subset AND completeness in one."""
    from nlp_with_pyspark_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_cluster_assign,
        semantic_dedup_pairs,
    )

    cents = _sem_centroids(emb)
    assign = {
        r.vec_id: r.list_id
        for r in semantic_cluster_assign(emb, cents).collect()
    }
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    want = {
        (a, b, c) for a, b, c in exact if assign[a] == assign[b]
    }
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in semantic_dedup_pairs(emb, cents, threshold=0.3).collect()
    }
    assert got == want
    assert got and len(got) < len(exact)  # non-vacuous, genuinely pruned


def test_semantic_cluster_cap_drops_whole_cluster(emb):
    """Clusters above max_vecs_per_cluster contribute ZERO pairs (the
    skew guard drops the cluster whole, like the minhash bucket cap)."""
    from nlp_with_pyspark_spark.operators.dedup import (
        semantic_cluster_assign,
        semantic_dedup_pairs,
    )

    cents = _sem_centroids(emb)
    sizes = (
        semantic_cluster_assign(emb, cents)
        .groupBy("list_id")
        .count()
        .collect()
    )
    cap = int(sorted(r["count"] for r in sizes)[len(sizes) // 2])  # median
    over = {r.list_id for r in sizes if r["count"] > cap}
    assert over, "fixture should have at least one above-median cluster"
    capped = semantic_dedup_pairs(
        emb, cents, threshold=0.0, max_vecs_per_cluster=cap
    ).collect()
    assert capped, "capped run should still produce pairs from small clusters"
    assert not {r.list_id for r in capped} & over


def test_semantic_stats_consistent_with_pairs(emb):
    """n_vectors sums to the corpus; n_dropped equals |distinct id_b|
    per cluster; every centroid row present."""
    from nlp_with_pyspark_spark.operators.dedup import (
        semantic_dedup_pairs,
        semantic_dedup_stats,
    )

    cents = _sem_centroids(emb)
    stats = {r.list_id: r for r in semantic_dedup_stats(emb, cents, threshold=0.3).collect()}
    assert set(stats) == {lid for lid, _ in cents}
    assert sum(r.n_vectors for r in stats.values()) == emb.count()
    pairs = semantic_dedup_pairs(emb, cents, threshold=0.3).collect()
    dropped = {}
    for r in pairs:
        dropped.setdefault(r.list_id, set()).add(r.id_b)
    for lid, row in stats.items():
        assert row.n_dropped == len(dropped.get(lid, ()))
        assert row.n_kept == row.n_vectors - row.n_dropped


def test_semantic_assign_is_pure_projection(emb):
    """The literal-compiled quantizer never joins or shuffles: zero
    Exchange anywhere in the assignment plan."""
    from nlp_with_pyspark_spark.operators.dedup import semantic_cluster_assign
    from nlp_with_pyspark_spark.plans.inspect import final_plan_string

    plan = final_plan_string(semantic_cluster_assign(emb, _sem_centroids(emb)))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_semantic_pandas_assign_equals_literal(emb):
    """The BLAS production assignment path (via='pandas') agrees with
    the literal-compiled oracle path vector-for-vector, ties included
    (both order centroids by list_id; argmin-first == lexicographic
    (d2, list_id) min)."""
    from nlp_with_pyspark_spark.operators.dedup import semantic_cluster_assign

    cents = _sem_centroids(emb, n_lists=12)
    lit = {
        r.vec_id: r.list_id
        for r in semantic_cluster_assign(emb, cents, via="literal").collect()
    }
    pan = {
        r.vec_id: r.list_id
        for r in semantic_cluster_assign(emb, cents, via="pandas").collect()
    }
    assert pan == lit and len(lit) == emb.count()


def test_semantic_pairs_pandas_assign_end_to_end(emb):
    """semantic_dedup_pairs(assign_via='pandas') returns the same pair
    set as the literal path."""
    from nlp_with_pyspark_spark.operators.dedup import semantic_dedup_pairs

    cents = _sem_centroids(emb)
    lit = sorted(map(tuple, semantic_dedup_pairs(emb, cents, threshold=0.3).collect()))
    pan = sorted(
        map(
            tuple,
            semantic_dedup_pairs(emb, cents, threshold=0.3, assign_via="pandas").collect(),
        )
    )
    assert pan == lit and lit


def test_semantic_dedup_with_trained_quantizer(emb):
    """Production composition: the k-means quantizer from
    build_ivf_index feeds semantic dedup directly (centroids are a
    plain (list_id, vector) list either way). Output is a subset of the
    exact all-pairs verifier with identical cosines."""
    from nlp_with_pyspark_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_dedup_pairs,
    )
    from nlp_with_pyspark_spark.operators.similarity import build_ivf_index

    _, cent_df = build_ivf_index(emb, n_lists=8)
    cents = [
        (int(r.list_id), [float(x) for x in r.centroid]) for r in cent_df.collect()
    ]
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in semantic_dedup_pairs(emb, cents, threshold=0.3, assign_via="pandas").collect()
    }
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    assert got and set(got) <= set(exact)
    assert all(exact[k] == v for k, v in got.items())


def test_semantic_pairs_with_trained_quantizer(emb):
    """End-to-end SemDeDup with a TRAINED quantizer: build_ivf_index's
    seeded k-means centroids feed semantic_dedup_pairs through the
    assigned= passthrough — the production composition (train once,
    assign once, dedup within clusters) — and the output obeys the same
    contract as the fixed-quantizer path: exactly the brute-force cosine
    pairs restricted to co-clustered endpoints."""
    from nlp_with_pyspark_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_dedup_pairs,
    )
    from nlp_with_pyspark_spark.operators.similarity import build_ivf_index

    assignments, centroids = build_ivf_index(emb, n_lists=8, seed=42)
    cents = [
        (int(r.list_id), [float(x) for x in r.centroid])
        for r in centroids.collect()
    ]
    assigned = assignments.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("cv").alias("embedding"),
        "list_id",
    )
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            emb, cents, threshold=0.3, assigned=assigned
        ).collect()
    }
    cluster = {r.vec_id: r.list_id for r in assigned.collect()}
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    want = {(a, b) for a, b in brute if cluster[a] == cluster[b]}
    assert got == want and got


def test_ann_recall_matches_driverside_recount(emb):
    """The recall composition (intersection join + per-query count +
    zero-hit LEFT join) equals an independent driver-side recount over
    its two constituents' collected id sets, at pruned AND full probe.
    (Recall is NOT asserted monotone in n_probe: the candidate SET
    grows monotonically — pinned by test_ivfpq_pruned_probe_is_subset —
    but the post-cut top-k can lose a true hit to a false near
    neighbor from a newly probed list; ADC is an approximation.)"""
    from nlp_with_pyspark_spark.operators.similarity import (
        ann_recall_at_k,
        exact_l2_topk,
        ivfpq_topk,
        pq_fixed_codebooks,
    )

    cent_rows = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    cents = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in cent_rows]
    cbs = pq_fixed_codebooks()
    queries = emb.where(F.col("vec_id") < 5)
    exact_ids = {}
    for r in exact_l2_topk(emb, queries, k=10).collect():
        exact_ids.setdefault(r.query_id, set()).add(r.neighbor_id)
    for n_probe in (1, 3, 8):
        approx_ids = {}
        for r in ivfpq_topk(emb, queries, cents, cbs, k=10, n_probe=n_probe).collect():
            approx_ids.setdefault(r.query_id, set()).add(r.neighbor_id)
        rows = ann_recall_at_k(
            emb, queries, cents, cbs, k=10, n_probe=n_probe
        ).collect()
        assert [r.query_id for r in rows] == [0, 1, 2, 3, 4]
        for r in rows:
            want = len(approx_ids.get(r.query_id, set()) & exact_ids[r.query_id])
            assert r.n_hits == want, (n_probe, r.query_id, r.n_hits, want)
            assert r.recall == round(want / 10.0, 6)


def _clustered_corpus(spark, emb, n_clusters=32, per=12, noise=0.15, seed=7):
    """Deterministic clustered embedding corpus: ``n_clusters`` centers
    drawn from the embeddings table, ``per`` seeded-noise members each —
    the structure real embedding corpora have (and the testdata's
    uniform random vectors do not), so quantizer training has something
    to learn."""
    import numpy as np

    seedvecs = np.array(
        [r.embedding for r in emb.orderBy("vec_id").limit(n_clusters).collect()]
    )
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = seedvecs[c] + noise * rng.randn(64)
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _trained_quantizer(corpus):
    from nlp_with_pyspark_spark.operators.similarity import (
        build_ivf_index,
        pq_train,
    )

    _, cents = build_ivf_index(corpus, n_lists=32)
    tr_cent = [
        (int(r.list_id), [float(x) for x in r.centroid]) for r in cents.collect()
    ]
    return tr_cent, pq_train(corpus, m=8, ksub=16, dim=64)


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_trained_quantizer_recall_beats_untrained(spark, emb):
    """The tuning loop ann_recall_at_k's docstring promises, closed
    end-to-end: train the coarse quantizer (k-means, build_ivf_index)
    and the PQ codebooks (pq_train) on the corpus and recall@10 against
    exact-L2 ground truth must materially beat the untrained
    oracle-able literals (first-8-vector centroids + fixed md5
    codebooks, the registered ann_recall_at_k configuration).

    Measured on a CLUSTERED corpus because that is the structure
    training learns; on the testdata's unclustered random vectors
    training at fixed capacity is honestly a no-op (~0.15 both ways —
    there is nothing to learn, measured r11). Same search budget both
    sides (k=10, n_probe=3); the trained side uses the production
    capacity the tuning loop would pick (n_lists=32 ≈ cluster count,
    ksub=16) while the untrained side is the registered
    8-centroid/ksub-4 literal config. Deterministic end-to-end (seeded
    data, seeded k-means): measured 0.253 untrained vs 0.700 trained
    at r11 — the assert leaves margin."""
    from nlp_with_pyspark_spark.operators.similarity import (
        ann_recall_at_k,
        pq_fixed_codebooks,
    )

    corpus = _clustered_corpus(spark, emb).cache()
    queries = corpus.where(F.col("vec_id") % 12 == 0)  # one per cluster
    cent_rows = (
        corpus.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    )
    unt_cent = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in cent_rows]
    r_unt = (
        ann_recall_at_k(
            corpus, queries, unt_cent, pq_fixed_codebooks(), k=10, n_probe=3
        )
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    tr_cent, books = _trained_quantizer(corpus)
    r_tr = (
        ann_recall_at_k(corpus, queries, tr_cent, books, k=10, n_probe=3)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    assert r_tr >= 2.5 * r_unt, f"trained {r_tr:.3f} vs untrained {r_unt:.3f}"
    assert r_tr >= 0.6 and r_unt <= 0.35, (r_tr, r_unt)


def test_ivfpq_rerank_full_probe_equals_exact(spark, emb):
    """The re-rank identity anchor: with every list probed and the
    shortlist covering the whole corpus, ivfpq_rerank_topk must equal
    exact_l2_topk ROW-FOR-ROW (same rounding, same tie-break) — the
    approximate stage only prunes, and with nothing pruned the exact
    re-rank restores the exact answer."""
    from nlp_with_pyspark_spark.operators.similarity import (
        exact_l2_topk,
        ivfpq_rerank_topk,
        pq_fixed_codebooks,
    )

    queries = emb.where(F.col("vec_id") < 5)
    cent_rows = (
        emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    )
    cents = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in cent_rows]
    n = emb.count()
    got = ivfpq_rerank_topk(
        emb, queries, cents, pq_fixed_codebooks(),
        k=10, shortlist=n, n_probe=len(cents),
    )
    exact = exact_l2_topk(emb, queries, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_ivfpq_rerank_lifts_recall(spark, emb):
    """The production two-stage shape earns its keep: exact re-ranking
    a 50-candidate ADC shortlist removes the ADC rank noise that
    dominates the plain path's residual recall loss. Deterministic:
    measured 0.700 plain vs 0.897 re-ranked at r11 (the remaining loss
    is true neighbors outside the 3 probed lists — a probe-budget
    effect the re-rank cannot and should not fix)."""
    from nlp_with_pyspark_spark.operators.similarity import (
        ann_recall_at_k,
        exact_l2_topk,
        ivfpq_rerank_topk,
    )

    corpus = _clustered_corpus(spark, emb).cache()
    queries = corpus.where(F.col("vec_id") % 12 == 0)
    tr_cent, books = _trained_quantizer(corpus)
    plain = (
        ann_recall_at_k(corpus, queries, tr_cent, books, k=10, n_probe=3)
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    rr = ivfpq_rerank_topk(
        corpus, queries, tr_cent, books, k=10, shortlist=50, n_probe=3
    )
    exact = exact_l2_topk(corpus, queries, k=10)
    n_hits = (
        rr.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count()
    )
    rerank = n_hits / (queries.count() * 10.0)
    assert rerank >= plain + 0.15, (rerank, plain)
    assert rerank >= 0.85, rerank
