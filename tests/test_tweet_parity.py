"""Reference-parity replay: the reference's own Kaggle dataset through
our MLlib pipeline (SURVEY §5 golden checks; BASELINE.md quality table).

The reference's published numbers (Part1.ipynb): NB 78.41% acc, LR
79.16%, majority baseline 57%. Our pipeline differs slightly by design
(native clean instead of UDFs, no NLTK custom stop list), so parity is
distributional: comfortably above baseline and within a few points of
the reference — not bitwise.
"""

import os

import pytest

from nlp_with_pyspark_spark.ml.classify import tweet_pipeline
from nlp_with_pyspark_spark.sources.io import TWEETS_SCHEMA, read_csv

TRAIN_CSV = "/root/reference/nlp-getting-started/train.csv"

# slow: ~3 min of MLlib reference-replay marathons over the frozen
# Kaggle golden — only ml/ changes can move them
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(TRAIN_CSV), reason="reference dataset not present"
    ),
]


@pytest.fixture(scope="module")
def tweets(spark):
    df = read_csv(spark, TRAIN_CSV, schema=TWEETS_SCHEMA)
    n = df.count()
    # BASELINE.md invariant: 7,613 training rows
    assert n == 7613, f"tweet ingest row count {n} != 7613 (CSV quoting bug?)"
    return df


def test_class_balance_invariant(tweets):
    # BASELINE.md: 4,342 non-disaster / 3,271 disaster
    counts = {r["target"]: r["count"] for r in tweets.groupBy("target").count().collect()}
    assert counts == {0: 4342, 1: 3271}


def test_logistic_regression_parity(tweets):
    res = tweet_pipeline(tweets, "logistic_regression")
    assert res["accuracy"] > 0.74, res  # reference: 0.7916
    assert res["f1"] > 0.70, res  # reference: 0.782


def test_naive_bayes_parity(tweets):
    res = tweet_pipeline(tweets, "naive_bayes")
    assert res["accuracy"] > 0.72, res  # reference: 0.7841


def test_rdd_lr_replay_beats_reference(spark, tweets):
    """The hand-rolled distributed-GD path (R1-R5, R10-R11) on the
    reference's own data: native TF-IDF (presence-TF, unsmoothed IDF)
    → sparse features → broadcast-weight batch GD with bold driver.

    Reference RDD LR (Part1.ipynb[67,69]): 79.68-79.81% accuracy with
    k=10000 and 300 iterations, 57-309s train. Ours reaches >80% with
    k=1000 and 100 iterations (measured 0.8104, ~55s end-to-end) — the
    broadcast + persist + single-Arrow-pass design wins on both axes.
    """
    import pyspark.sql.functions as F

    from nlp_with_pyspark_spark.functions.text import tokens_pipeline
    from nlp_with_pyspark_spark.ml.gd import GDTrainer, sparse_features
    from nlp_with_pyspark_spark.operators.features import tf_idf
    from nlp_with_pyspark_spark.operators.vocab import top_k_vocabulary

    docs = (
        tweets.select(
            F.col("id").alias("doc_id"), "text", F.col("target").alias("label")
        )
        .withColumn("tokens", tokens_pipeline(F.col("text")))
        .cache()
    )
    vocab = top_k_vocabulary(docs, k=1000)
    long = tf_idf(docs, vocab).cache()
    feats = sparse_features(long, docs.select("doc_id", "label"))
    train, test = feats.randomSplit([0.8, 0.2], seed=123)
    train = train.cache()
    t = GDTrainer(k=1000, loss="logistic", optimizer="gd", lr=0.01, iterations=100, l2=1.15)
    t.fit(train)
    assert t.costs_[-1] < t.costs_[0]
    preds = t.predict_long(long.join(test.select("doc_id"), "doc_id"))
    joined = preds.join(feats.select("doc_id", F.col("label").alias("y")), "doc_id")
    acc = joined.agg(F.avg((F.col("pred") == F.col("y")).cast("double"))).first()[0]
    # reference: 0.7968-0.7981; margin below our measured 0.8104 for
    # split/partitioning jitter, still well above the 0.57 majority rate
    assert acc > 0.75, f"RDD-LR replay accuracy {acc}"


def test_nn_replay_beats_reference(spark, tweets):
    """R9 replay: disaster-only k=1000 vocabulary (RDD_NN.py:320-326),
    2-layer NN. Reference: 71.10-71.72% accuracy. Ours (corrected Adam,
    vectorized single-pass backprop) measured 0.8879 in ~70s."""
    import pyspark.sql.functions as F

    from nlp_with_pyspark_spark.functions.text import tokens_pipeline
    from nlp_with_pyspark_spark.ml.gd import sparse_features
    from nlp_with_pyspark_spark.ml.nn import NNTrainer
    from nlp_with_pyspark_spark.operators.features import tf_idf
    from nlp_with_pyspark_spark.operators.vocab import top_k_vocabulary

    docs = (
        tweets.select(
            F.col("id").alias("doc_id"), "text", F.col("target").alias("label")
        )
        .withColumn("tokens", tokens_pipeline(F.col("text")))
        .cache()
    )
    vocab = top_k_vocabulary(docs.where(F.col("label") == 1), k=1000)
    long = tf_idf(docs, vocab).cache()
    feats = sparse_features(long, docs.select("doc_id", "label"))
    train, test = feats.randomSplit([0.8, 0.2], seed=123)
    t = NNTrainer(k=1000, hidden=128, optimizer="adam", lr=0.005, iterations=40, seed=123)
    t.fit(train.cache())
    assert t.costs_[-1] < t.costs_[0]
    preds = t.predict(test.cache())
    joined = preds.join(feats.select("doc_id", F.col("label").alias("y")), "doc_id")
    acc = joined.agg(F.avg((F.col("pred") == F.col("y")).cast("double"))).first()[0]
    assert acc > 0.75, f"NN replay accuracy {acc}"


def test_grid_sweep_matches_notebook_tables(tweets):
    """M11: the notebook's regParam sweeps (Part1.ipynb[32,37];
    BASELINE.md 'Hyperparameter sweeps'). Our featurization differs
    slightly by design (native clean, no NLTK custom stop list) and the
    80/20 split is seed-equal but not row-identical, so parity is
    per-point tolerance + shape: every accuracy within 4 points of the
    published value, and the regParam=10 collapse (the table's headline
    feature) reproduced as the worst point of each sweep."""
    from nlp_with_pyspark_spark.ml.classify import grid_sweep

    grid = (1e-4, 1e-3, 1e-2, 0.1, 1.0, 10.0)
    ref = {
        "logistic_regression": [0.7456, 0.7581, 0.7757, 0.7782, 0.7838, 0.6560],
        "linear_svc": [0.7631, 0.7631, 0.7625, 0.7722, 0.7773, 0.6091],
    }
    for estimator, want in ref.items():
        got = grid_sweep(tweets, reg_params=grid, estimator=estimator)
        accs = [r["accuracy"] for r in got]
        assert [r["regParam"] for r in got] == list(grid)
        for rp, ours, theirs in zip(grid, accs, want):
            assert abs(ours - theirs) < 0.04, (estimator, rp, ours, theirs)
        # the large-regParam collapse is the sweep's defining shape
        assert accs[-1] == min(accs), (estimator, accs)


def test_tree_trio_parity(tweets):
    """M9's remaining estimators (Trees.py:101-103; BASELINE.md): the
    tree trio on the reference's own data. Published accuracies —
    DT 60.63%, RF 62.09%, GBT 73.45% — with the trees' characteristic
    ordering (boosting > bagging > single tree on sparse TF-IDF).
    Tolerance mirrors the grid-sweep test: featurization differs
    slightly by design and tree splits are threshold-sensitive."""
    ref = {"decision_tree": 0.6063, "random_forest": 0.6209, "gbt": 0.7345}
    got = {}
    for model, want in ref.items():
        res = tweet_pipeline(tweets, model)
        got[model] = res["accuracy"]
        assert abs(res["accuracy"] - want) < 0.05, (model, res["accuracy"], want)
    assert got["gbt"] > got["random_forest"], got
