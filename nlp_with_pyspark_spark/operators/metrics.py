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


def binary_auc_exact(
    scored: DataFrame, score_col: str = "score", label_col: str = "y"
) -> DataFrame:
    """Single-row (n_pos, n_neg, auc): exact ROC-AUC via the
    Mann-Whitney rank identity — AUC = (Σ ranks of positives −
    n⁺(n⁺+1)/2) / (n⁺·n⁻), with AVERAGE ranks over score ties (the
    textbook tie correction; ties are real once scores are rounded for
    engine stability).

    This is the VERIFIER: global average-ranking is a total sort — the
    one thing a 100 TB eval set must not do. Use
    :func:`binary_auc_bucketed` at scale and this to validate it at
    test scale (same pairing as brute-force vs LSH in similarity.py).
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    # ties broken arbitrarily by row_number; the avg over the tie group
    # below is order-invariant (same SET of ranks whatever the order)
    rn = F.row_number().over(Window.orderBy(s))
    avg_rank = F.avg("rn").over(Window.partitionBy(score_col))
    ranked = scored.select(score_col, F.col(label_col).alias("y")).withColumn(
        "rn", rn
    ).withColumn("ar", avg_rank)
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("ar")).otherwise(F.lit(0.0))).alias("rpos"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n_neg"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    return agg.select(
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        F.round(
            (F.col("rpos") - np_ * (np_ + 1) / 2) / (np_ * nn), 6
        ).alias("auc"),
    )


def binary_auc_bucketed(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    n_buckets: int = 1000,
) -> DataFrame:
    """Single-row (n_pos, n_neg, auc): trapezoidal ROC-AUC over
    ``n_buckets`` score bins — the scale path.

    One map-side-combined hash agg produces per-bucket (pos, neg)
    counts — a mergeable 2·n_buckets-int sketch, the same shape trick
    as approx_percentile — then the ROC walk (cumulative TPR/FPR from
    the highest bucket down, trapezoid area per step) runs as ordered
    windows over ≤ n_buckets rows. The eval set is read once and never
    sorted; resolution error is bounded by the bin width (scores
    uniform-ish in [0,1] ⇒ |exact − bucketed| ≲ 1/n_buckets).

    Scores are assumed in [0, 1] (clamped). Counts are exact integers,
    so both engines agree bit-for-bit through the cumulative walk.
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor(s * n_buckets).cast("int")),
    )
    per = (
        scored.select(bucket.alias("b"), F.col(label_col).alias("y"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("p"),
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n"),
        )
    )
    w = Window.orderBy(F.desc("b")).rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        F.sum("p").over(w).alias("ctp"),
        F.sum("n").over(w).alias("cfp"),
        (F.sum("p").over(w) - F.col("p")).alias("ptp"),
        (F.sum("n").over(w) - F.col("n")).alias("pfp"),
    )
    agg = cum.agg(
        F.max("ctp").alias("n_pos"),
        F.max("cfp").alias("n_neg"),
        F.sum(
            (F.col("cfp") - F.col("pfp")) * (F.col("ctp") + F.col("ptp"))
        ).alias("area2"),
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        # area2 sums integer products exactly; one double division at the end
        F.round(
            F.col("area2").cast("double") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )
