"""read_table must not depend on session-builder configs.

The driver's correctness harness builds its own vanilla ``SparkSession``
(no engine defaults), so the nanos-timestamp handling for ``events`` has
to be self-contained in ``read_table`` (a runtime SQL conf set at read
time). Round-1 regression: all six events queries died with
PARQUET_TYPE_ILLEGAL under the driver session while passing under the
builder session.
"""

import pytest

from nlp_with_pyspark_spark.sources.io import read_table

from .conftest import SF_DIR


@pytest.fixture()
def vanilla_conf(spark):
    """Simulate a vanilla session: strip the engine-set nanos conf."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    yield spark
    spark.conf.set(key, "true")


def test_events_read_without_engine_defaults(vanilla_conf):
    spark = vanilla_conf
    df = read_table(spark, SF_DIR, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    assert df.count() > 0


def test_events_query_without_engine_defaults(vanilla_conf):
    from nlp_with_pyspark_spark import queries

    spark = vanilla_conf
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    df = queries.events_tumbling_5m(spark, SF_DIR)
    assert df.count() > 0
