"""Vector math over ``array<float|double>`` columns — pure Catalyst.

The reference does all vector math in NumPy inside RDD closures (F11,
e.g. RDD_logisticregression.py:103-109). For query-side vector ops
(dot products, cosine similarity for the similarity-search operators)
we stay JVM-side with higher-order functions: ``zip_with`` + ``aggregate``
compile to codegen'd loops — no Python worker, no Arrow hop.

Heavy batched math (gradient descent, NN training) still uses NumPy, but
behind Arrow ``pandas_udf`` — see ml/gd.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double result).

    ``aggregate(zip_with(a, b, *), 0.0, +)`` — a sequential left fold,
    deterministic summation order (matters for float reproducibility
    against the DuckDB oracle).
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    c = _c(a)
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def squared_l2(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance of two array columns (double).

    ``aggregate(zip_with(a, b, diff²), 0.0, +)`` — the same sequential
    left fold as :func:`dot`, matching DuckDB's
    ``list_sum(list_transform(list_zip(a, b), …))`` association order
    so pre-rounding float drift stays at the 1-ulp level.
    """
    diffs = F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (guarded).

    Three folds per evaluation — for all-pairs workloads, pre-normalize
    each side once with ``unit_normalize`` and take ``dot`` instead.
    """
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: q_i = clamp(⌊x_i/s + ½⌋)
    with s = max|x|/127 — the standard embedding-compression step (4×
    smaller than float32 in storage and shuffle, the difference between
    a broadcastable index and one that isn't at 100 TB).

    Returns a struct (scale double, q array<int>). ``floor(x + 0.5)``
    instead of round() pins the half-mode explicitly so the DuckDB
    oracle reproduces every code bit-for-bit. Zero vectors get scale 0
    and all-zero codes (guarded division).
    """
    from .expr import flet

    c = _c(vec)
    max_abs = F.aggregate(
        c, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )

    # flet-bind the scale: referencing the O(dim) max-abs fold inside the
    # per-element transform lambda would re-run it per element (the
    # documented O(dim²) lambda-inlining foot-gun, functions/expr.py)
    def build(s: Column) -> Column:
        q = F.when(s == 0.0, F.transform(c, lambda x: F.lit(0))).otherwise(
            F.transform(
                c,
                lambda x: F.greatest(
                    F.lit(-127),
                    F.least(F.lit(127), F.floor(x.cast("double") / s + F.lit(0.5)).cast("int")),
                ),
            )
        )
        return F.struct(s.alias("scale"), q.alias("q"))

    return flet(max_abs / F.lit(127.0), build)


def dequantize_error(vec: Column | str, quant: Column) -> Column:
    """Struct (mse double, max_abs_err double) of reconstructing
    ``quant`` (from :func:`quantize_int8`) against the original vector —
    the quality audit that decides whether int8 is safe for a corpus.

    ``quant`` is flet-bound before use: callers may pass the
    ``quantize_int8(...)`` EXPRESSION directly (not a materialized
    column), and referencing its fields inside the error lambda would
    otherwise re-run the whole quantization per element."""
    from .expr import flet

    c = _c(vec)

    def stats(err: Column) -> Column:
        n = F.size(c).cast("double")
        mse = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e) / n
        mx = F.aggregate(err, F.lit(0.0), lambda acc, e: F.greatest(acc, F.abs(e)))
        return F.struct(mse.alias("mse"), mx.alias("max_abs_err"))

    def build(qt: Column) -> Column:
        err = F.zip_with(
            c, qt["q"], lambda x, qi: x.cast("double") - qi.cast("double") * qt["scale"]
        )
        # err feeds two folds — bind it so zip_with runs once
        return flet(err, stats)

    return flet(quant, build)


def unit_normalized(df, vec_col: str, out_col: str):
    """DataFrame with ``out_col`` = vec/‖vec‖ (array<double>); zero
    vectors pass through unchanged (their dot with anything is 0,
    matching the cosine guard).

    Two projections on purpose: the norm is materialized as its own
    column first, so the per-element division references a computed
    value — inlining ``l2_norm`` inside the ``transform`` lambda would
    re-run the O(dim) fold once per element (O(dim²)/row).
    """
    with_norm = df.withColumn("__nrm", l2_norm(F.col(vec_col)))
    nrm = F.col("__nrm")
    scaled = F.when(
        nrm == 0.0, F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).otherwise(F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm))
    return with_norm.withColumn(out_col, scaled).drop("__nrm")
