"""Every registered (query, oracle) pair must hash-match at sf0.001.

This mirrors the driver's t2 correctness gate (run at sf0.01); sf0.001
keeps the suite fast for the inner loop. Set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to run the exact driver scale.
"""

import pytest

from nlp_with_pyspark_spark.queries import ORACLES, QUERIES

from .conftest import SF_DIR_ORACLE
from .oracle_utils import assert_oracle_match


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    assert_oracle_match(spark, QUERIES[name], ORACLES[name], sf_dir, name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_count_distinct_near_exact(spark, sf_dir):
    """The 100 TB swap-in for countDistinct: HLL++ (rsd=0.05) must land
    within 10% of the exact per-group answer (events_distinct_users)."""
    import pyspark.sql.functions as F

    from nlp_with_pyspark_spark.sources.io import read_table

    events = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.05).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.1 * exact[k], 2), (k, exact[k], approx[k])


def test_approx_percentile_near_exact(spark):
    """The 100 TB swap-in for exact group percentiles (price_percentiles):
    approx_percentile's mergeable sketch (accuracy=10000) must land within
    1% of the exact per-group answer — a full sort buffer per group does
    not exist at that scale; the sketch combines map-side.

    Probed at sf0.01 (~4k rows/group): approx returns a real element
    (nearest rank) while exact interpolates, so the gap shrinks as
    groups grow — at sf0.001's ~400-row groups that representation
    difference alone exceeds 1% and would drown the sketch-error signal
    this test is about."""
    import pyspark.sql.functions as F

    from nlp_with_pyspark_spark.sources.io import read_table

    orders = read_table(spark, SF_DIR_ORACLE, "orders")
    exact = {
        r.o_orderpriority: (r.p50, r.p99)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    approx = {
        r.o_orderpriority: (r.p50, r.p99)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99"),
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for k, (e50, e99) in exact.items():
        a50, a99 = approx[k]
        assert abs(a50 - e50) <= 0.01 * e50, (k, e50, a50)
        # p99 tolerance is wider at small SF: approx returns a real
        # element (nearest rank) while exact interpolates between the
        # few order statistics in the tail of a ~400-row group
        assert abs(a99 - e99) <= 0.05 * e99, (k, e99, a99)
