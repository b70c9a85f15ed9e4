"""Classification metrics as one-pass conditional aggregates (A8, R11).

Reference computes the confusion matrix with a per-row 4-tuple map +
tuple-add reduce, run twice by accident
(RDD_logisticregression.py:183-189,231,239). Here it is a single
HashAggregate pass: four ``sum(when(...))`` columns + derived
accuracy/F1 — fully distributed, no driver funnel, and trivially
correct at any scale.

F1 uses the reference's formula f1 = tp / (tp + 0.5·(fp+fn))
(RDD_logisticregression.py:235-242) — algebraically the standard
harmonic mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_from_predictions(
    preds: DataFrame, pred_col: str = "pred", label_col: str = "y"
) -> DataFrame:
    """(pred, y) ∈ {0,1}² → single-row (tp, tn, fp, fn, accuracy, f1)."""
    p, y = F.col(pred_col), F.col(label_col)
    agged = preds.agg(
        F.sum(F.when((p == 1) & (y == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((p == 0) & (y == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((p == 1) & (y == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((p == 0) & (y == 1), 1).otherwise(0)).alias("fn"),
        F.count(F.lit(1)).alias("_total"),
    )
    return agged.select(
        "tp",
        "tn",
        "fp",
        "fn",
        F.round((F.col("tp") + F.col("tn")).cast("double") / F.col("_total"), 6).alias(
            "accuracy"
        ),
        F.round(
            F.col("tp").cast("double")
            / (F.col("tp") + 0.5 * (F.col("fp") + F.col("fn"))),
            6,
        ).alias("f1"),
    )


def accuracy_f1(preds: DataFrame, pred_col: str = "pred", label_col: str = "y") -> tuple[float, float]:
    """Driver-side convenience: returns (accuracy, f1) floats."""
    row = confusion_from_predictions(preds, pred_col, label_col).first()
    return float(row["accuracy"]), float(row["f1"])
