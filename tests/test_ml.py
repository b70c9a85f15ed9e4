"""ML-surface tests (SURVEY §5 non-oracle paths): finite-difference
gradient checks, cost-decrease properties, and learnability smoke tests."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from nlp_with_pyspark_spark.functions.text import tokens_pipeline
from nlp_with_pyspark_spark.ml.gd import GDTrainer, _partials, sparse_features
from nlp_with_pyspark_spark.ml.nn import NNTrainer
from nlp_with_pyspark_spark.operators.features import tf_idf
from nlp_with_pyspark_spark.operators.vocab import top_k_vocabulary
from nlp_with_pyspark_spark.sources.io import read_table


class _FakeBC:
    def __init__(self, v):
        self.value = v


def _tiny_batch():
    return pd.DataFrame(
        {
            "label": [1, 0, 1],
            "indices": [[0, 2], [1, 3], [0, 4]],
            "values": [[0.5, 1.0], [0.3, 0.7], [1.2, 0.1]],
        }
    )


@pytest.mark.parametrize("loss", ["logistic", "hinge"])
def test_gradient_matches_finite_difference(loss):
    k = 5
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.5, k)
    pdf = _tiny_batch()

    def eval_at(wv):
        out = next(_partials(loss, k, _FakeBC(wv))(iter([pdf])))
        return float(out["cost"][0]), np.asarray(out["grad"][0])

    cost0, grad = eval_at(w)
    eps = 1e-6
    for j in range(k):
        wp = w.copy()
        wp[j] += eps
        wm = w.copy()
        wm[j] -= eps
        fd = (eval_at(wp)[0] - eval_at(wm)[0]) / (2 * eps)
        assert abs(fd - grad[j]) < 1e-4, f"{loss} grad[{j}]: fd={fd} analytic={grad[j]}"


@pytest.fixture(scope="module")
def doc_features(spark, sf_dir):
    """Sparse TF-IDF features with a separable label (doc contains 'spark')."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .withColumn("tokens", tokens_pipeline(F.col("text")))
        .cache()
    )
    vocab = top_k_vocabulary(docs, k=50)
    long = tf_idf(docs, vocab).cache()
    labels = docs.select(
        "doc_id", F.array_contains("tokens", "spark").cast("int").alias("label")
    )
    feats = sparse_features(long, labels).cache()
    return long, feats


@pytest.mark.parametrize("optimizer", ["gd", "momentum", "nesterov", "adam", "adagrad", "rmsprop"])
def test_lr_cost_decreases_all_optimizers(doc_features, optimizer):
    _, feats = doc_features
    lr = 0.05 if optimizer in ("adam", "adagrad", "rmsprop") else 0.001
    t = GDTrainer(k=50, loss="logistic", optimizer=optimizer, lr=lr, iterations=12, l2=0.01)
    t.fit(feats)
    assert len(t.costs_) == 12
    assert t.costs_[-1] < t.costs_[0], f"{optimizer}: {t.costs_[0]} -> {t.costs_[-1]}"


@pytest.mark.parametrize("optimizer", ["nesterov", "rmsprop"])
def test_reference_compat_optimizers_descend(doc_features, optimizer):
    """compat='reference' replays the as-written (nonstandard) Nesterov/
    RMSprop formulas (LR_Optimizers.py:162-184); they must still reduce
    cost, and must differ from the standard-formula trajectory."""
    _, feats = doc_features
    kw = dict(k=50, loss="logistic", optimizer=optimizer, lr=0.01, iterations=10, l2=0.01)
    ref = GDTrainer(compat="reference", **kw)
    ref.fit(feats)
    std = GDTrainer(compat="standard", **kw)
    std.fit(feats)
    assert ref.costs_[-1] < ref.costs_[0]
    assert ref.costs_ != std.costs_


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_svm_cost_decreases(doc_features):
    _, feats = doc_features
    t = GDTrainer(k=50, loss="hinge", optimizer="gd", lr=0.001, iterations=40)
    t.fit(feats)
    assert t.costs_[-1] < t.costs_[0]


def test_svm_early_stop_triggers(doc_features):
    _, feats = doc_features
    # tol chosen above the per-iteration delta at this lr so the
    # |Δcost| ≤ tol rule (RDD_SVM.py:155-157) fires quickly
    t = GDTrainer(
        k=50, loss="hinge", optimizer="gd", lr=0.001, iterations=50, early_stop_tol=1.0
    )
    t.fit(feats)
    assert len(t.costs_) < 50, "early stop never triggered"


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_lr_finds_signal_feature(spark, doc_features, sf_dir):
    """Mechanism test: training on 'doc contains <word>' must put the
    single largest weight on <word>'s own feature and beat the base rate.
    (Full separation is NOT reachable here: no intercept + presence/len
    TF values of O(0.01) mean the separator needs unbounded weights —
    matching the reference's own no-intercept model, R10.)"""
    from nlp_with_pyspark_spark.operators.vocab import top_k_vocabulary
    from nlp_with_pyspark_spark.sources.io import read_table

    long, feats = doc_features
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "tokens", tokens_pipeline(F.col("text"))
    )
    spark_idx = (
        top_k_vocabulary(docs, k=50).filter(F.col("word") == "spark").first()["idx"]
    )
    t = GDTrainer(k=50, loss="logistic", optimizer="adam", lr=0.5, iterations=80, l2=0.0)
    t.fit(feats)
    assert int(np.argmax(t.weights_)) == spark_idx
    preds = t.predict_long(long)
    joined = preds.join(feats.select("doc_id", F.col("label").alias("y")), "doc_id")
    base = joined.agg(F.avg(F.col("y").cast("double"))).first()[0]
    base_rate = max(base, 1 - base)
    acc = joined.agg(F.avg((F.col("pred") == F.col("y")).cast("double"))).first()[0]
    assert acc > base_rate, f"acc {acc} did not beat base rate {base_rate}"


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_lr_separates_synthetic(spark):
    """Well-scaled separable data (feature 0 ⇔ label 1, feature 1 ⇔ label 0,
    O(1) values) must be driven to ~perfect accuracy."""
    rows = []
    rng = np.random.default_rng(7)
    for i in range(200):
        y = i % 2
        sig = 0 if y == 1 else 1
        noise_idx = int(rng.integers(2, 10))
        rows.append((i, y, [sig, noise_idx], [1.0, float(rng.normal(0, 0.3))]))
    feats = spark.createDataFrame(
        rows, "doc_id long, label int, indices array<long>, values array<double>"
    )
    t = GDTrainer(k=10, loss="logistic", optimizer="adam", lr=0.2, iterations=60, l2=0.0)
    t.fit(feats)
    long = feats.select(
        "doc_id", F.posexplode(F.arrays_zip("indices", "values"))
    ).select(
        "doc_id",
        F.col("col.indices").cast("int").alias("idx"),
        F.col("col.values").alias("tfidf"),
    )
    preds = t.predict_long(long)
    joined = preds.join(feats.select("doc_id", F.col("label").alias("y")), "doc_id")
    acc = joined.agg(F.avg((F.col("pred") == F.col("y")).cast("double"))).first()[0]
    assert acc > 0.97, f"synthetic separable data learned poorly: {acc}"


@pytest.mark.slow  # heavy e2e/marathon; kin + oracle parity cover the default run
def test_top_features_and_cost_sink(spark, doc_features, sf_dir, tmp_path):
    """R12 report surfaces 'spark' for the contains-spark label; R13 sink
    writes exactly one part file."""
    from nlp_with_pyspark_spark.operators.vocab import top_k_vocabulary
    from nlp_with_pyspark_spark.sources.io import read_table

    _, feats = doc_features
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "tokens", tokens_pipeline(F.col("text"))
    )
    vocab = top_k_vocabulary(docs, k=50)
    t = GDTrainer(k=50, loss="logistic", optimizer="adam", lr=0.5, iterations=40, l2=0.0)
    t.fit(feats)
    top = t.top_features(vocab, n=5)
    rows = top.collect()
    assert len(rows) == 5
    assert rows[0].word == "spark"  # the label-defining token dominates
    assert [r.weight for r in rows] == sorted((r.weight for r in rows), reverse=True)

    out = str(tmp_path / "costs")
    t.save_cost_curve(spark, out)
    import glob

    parts = glob.glob(f"{out}/part-*")
    assert len(parts) == 1, f"expected one part file, got {parts}"


def test_nn_cost_decreases(doc_features):
    _, feats = doc_features
    t = NNTrainer(k=50, hidden=16, optimizer="adam", lr=0.01, iterations=15, seed=1)
    t.fit(feats)
    assert t.costs_[-1] < t.costs_[0]


def test_nn_reference_compat_descends(doc_features):
    """compat='reference' NN Adam (bias 2nd-moment bug as written,
    RDD_NN.py:198) must still reduce cost and differ from standard."""
    _, feats = doc_features
    kw = dict(k=50, hidden=16, optimizer="adam", lr=0.01, iterations=10, seed=1)
    ref = NNTrainer(compat="reference", **kw)
    ref.fit(feats)
    std = NNTrainer(compat="standard", **kw)
    std.fit(feats)
    assert ref.costs_[-1] < ref.costs_[0]
    assert ref.costs_ != std.costs_


def test_nn_predict_schema(doc_features):
    _, feats = doc_features
    t = NNTrainer(k=50, hidden=8, optimizer="sgd", lr=0.05, iterations=5, seed=2)
    t.fit(feats)
    preds = t.predict(feats)
    rows = preds.collect()
    assert all(r.pred in (0, 1) for r in rows)
    assert preds.count() == feats.count()
