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


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    """Schema'd NDJSON read (no inference pass) roundtrips values and
    routes corrupt lines to _corrupt_record instead of failing."""
    import pyspark.sql.types as T

    from nlp_with_pyspark_spark.sources.io import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "seconde ligne"}\n'
        "this is not json\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema)
    rows = df.collect()
    good = {(r.doc_id, r.text) for r in rows if r._corrupt_record is None}
    assert good == {(1, "hello world"), (2, "seconde ligne")}
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1
