"""Every registered (query, oracle) pair must hash-match at sf0.001.

This mirrors the driver's t2 correctness gate (run at sf0.01); sf0.001
keeps the suite fast for the inner loop. Set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to run the exact driver scale.
"""

import pytest

from nlp_with_pyspark_spark.queries import ORACLES, QUERIES

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
