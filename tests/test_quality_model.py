"""Learned quality filter (operators/quality_model.py): provenance of
the pinned weights, distributed≡single-node training equivalence, and
the scan-speed serving contract.

The layered provenance argument (module docstring has the full story):
  1. GDTrainer short-prefix run ≡ numpy_gd_twin on the same features —
     the twin IS the distributed loop, minus partitioning;
  2. twin at the full pinned recipe reproduces QUALITY_LR_WEIGHTS —
     re-derived from scratch on every pytest run, milliseconds;
  3. serving is a pure projection (no Exchange, no join, no Python)
     and the model actually learned the gate (accuracy vs teacher).
Oracle parity of the registered quality_lr_filter query is covered by
test_oracle_parity like every other registered query.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nlp_with_pyspark_spark.operators.quality_model import (
    QUALITY_LR_RECIPE,
    QUALITY_LR_WEIGHTS,
    numpy_gd_twin,
    quality_lr_scores,
    train_quality_lr,
)
from nlp_with_pyspark_spark.operators.textstats import quality_features
from nlp_with_pyspark_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


def _xy(docs):
    # doc_id order pins the twin's float-summation order, making the
    # full-recipe rerun bit-reproducible against the pinned literals
    pdf = quality_features(docs).orderBy("doc_id").toPandas()
    X = np.column_stack(
        [
            np.ones(len(pdf)),
            pdf.alpha_ratio,
            pdf.punct_ratio,
            pdf.stopword_ratio,
            pdf.mean_word_len / 10.0,
            np.log1p(pdf.n_tokens) / 10.0,
        ]
    )
    y = (pdf.quality_score >= QUALITY_LR_RECIPE["label_min_score"]).to_numpy(float)
    return X, y, pdf


def test_distributed_trainer_matches_numpy_twin(docs):
    """25 iterations of the real GDTrainer land within float-summation
    noise of the twin — so the twin's full-recipe rerun (next test) is
    provenance for the distributed path, not a separate model."""
    X, y, _ = _xy(docs)
    t = train_quality_lr(docs, iterations=25)
    w_twin = numpy_gd_twin(X, y, QUALITY_LR_RECIPE["lr"], 25, QUALITY_LR_RECIPE["l2"])
    np.testing.assert_allclose(np.asarray(t.weights_), w_twin, rtol=1e-6, atol=1e-9)


def test_pinned_weights_rederive_from_scratch(docs):
    """The full 2000-iteration recipe, zeros init, reproduces the
    pinned serving literals — they cannot drift from the recipe."""
    X, y, _ = _xy(docs)
    r = QUALITY_LR_RECIPE
    w = numpy_gd_twin(X, y, r["lr"], r["iterations"], r["l2"])
    np.testing.assert_allclose(w, np.asarray(QUALITY_LR_WEIGHTS), rtol=1e-9, atol=1e-12)


def test_model_learned_the_gate(docs):
    """Student vs teacher accuracy on the training corpus — the model
    separates, it isn't a constant keep/drop."""
    X, y, _ = _xy(docs)
    scored = quality_lr_scores(docs).toPandas()
    acc = ((scored.sort_values("doc_id").keep.to_numpy()) == (y == 1)).mean()
    assert acc >= 0.93, acc
    assert 0 < scored.keep.sum() < len(scored)


def test_serving_is_a_pure_projection(docs):
    """The literal-compiled scorer costs a scan + codegen'd expressions:
    no Exchange, no Join, no Python eval anywhere in the plan."""
    plan = (
        quality_lr_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan, (op, plan)


def test_calibration_bins_partition_and_order(docs):
    """Bins partition the corpus; mean_score sits inside its decile;
    frac_positive trends upward with the score (the model is at least
    rank-calibrated against its teacher on the training corpus)."""
    from nlp_with_pyspark_spark.operators.quality_model import (
        quality_lr_calibration,
    )

    pdf = quality_lr_calibration(docs).toPandas()
    assert pdf.n_docs.sum() == docs.count()
    assert pdf.bin.is_monotonic_increasing
    for r in pdf.itertuples():
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.0 + 1e-9
        assert lo <= r.mean_score <= hi, r
    # lowest-populated bin should be less positive than the highest
    assert pdf.iloc[0].frac_positive <= pdf.iloc[-1].frac_positive


def test_custom_weights_and_validation(docs):
    with pytest.raises(ValueError):
        quality_lr_scores(docs, weights=(1.0, 2.0))
    out = quality_lr_scores(docs, weights=(0.0,) * 6).limit(5).collect()
    assert all(abs(r["score"] - 0.5) < 1e-9 and r["keep"] for r in out)
