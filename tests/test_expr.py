"""functions/expr.flet: single-evaluation let-binding for lambdas."""

import pyspark.sql.functions as F


def test_flet_value_and_types(spark):
    from nlp_with_pyspark_spark.functions.expr import flet

    df = spark.createDataFrame([(1, [3, 1, 2])], "id long, xs array<int>")
    out = df.select(
        flet(F.array_sort("xs"), lambda s: F.struct(
            F.element_at(s, 1).alias("lo"),
            F.element_at(s, -1).alias("hi"),
            F.size(s).alias("n"),
        )).alias("r")
    ).first().r
    assert (out.lo, out.hi, out.n) == (1, 3, 3)


def test_flet_binds_once_not_per_element(spark):
    """The reason flet exists: an expensive derived array referenced
    inside a per-element lambda must not be recomputed per element.
    Timing-based proof lives in the operators (shingles went 18.7s→0.9s);
    here we pin the semantic shape: nested lambdas can close over the
    bound variable."""
    from nlp_with_pyspark_spark.functions.expr import flet

    df = spark.createDataFrame([([1, 2, 3, 4],)], "xs array<int>")
    # pairwise sums via indices into the BOUND array
    out = df.select(
        flet(F.col("xs"), lambda t: F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.element_at(t, i) + F.element_at(t, i + 1),
        )).alias("sums")
    ).first().sums
    assert out == [3, 5, 7]
