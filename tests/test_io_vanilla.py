"""read_table must not depend on session-builder configs.

The driver's correctness harness builds its own vanilla ``SparkSession``
(no engine defaults), so the nanos-timestamp handling for ``events`` has
to be self-contained in ``read_table`` (a runtime SQL conf set at read
time). Round-1 regression: all six events queries died with
PARQUET_TYPE_ILLEGAL under the driver session while passing under the
builder session.
"""

import pytest
from pyspark.sql import functions as F

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


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_read_survives_either_timestamp_layout(spark, tmp_path, unit):
    """Regression for the round-4 breakage: the driver testdata flipped
    events.ts from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and
    every ts_ns consumer died. read_table must normalize BOTH physical
    layouts to the same (ts timestamp, ts_ns long) pair with identical
    values, so the next flip is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_123_456  # epoch micros with sub-second part
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([base_us, base_us + 7_000_000], pa.timestamp(unit)
                           if unit == "us" else pa.timestamp("ns")),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    if unit == "ns":
        # pyarrow interprets the ints in the declared unit; rebuild in ns
        tbl = tbl.set_column(
            1, "ts", pa.array([base_us * 1000, (base_us + 7_000_000) * 1000],
                              pa.timestamp("ns")),
        )
    d = tmp_path / f"sf_{unit}"
    d.mkdir()
    # version 2.6 is what allows a true TIMESTAMP(NANOS) physical type
    pq.write_table(tbl, d / "events.parquet", store_schema=False, version="2.6")

    df = read_table(spark, str(d), "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    got = sorted((r.event_id, r.ts_ns) for r in df.collect())
    assert got == [
        (1, base_us * 1000),
        (2, (base_us + 7_000_000) * 1000),
    ]


def test_events_ts_ns_immune_to_session_timezone(spark):
    """The micros/NTZ branch of normalize_events casts through the
    session timezone at execution time: under a non-UTC session that
    cast would shift every ts_ns by the local offset unless read_table
    pins UTC. Simulate a driver session configured elsewhere."""
    tz_key = "spark.sql.session.timeZone"
    spark.conf.set(tz_key, "America/New_York")
    try:
        df = read_table(spark, SF_DIR, "events")
        got = df.selectExpr("min(ts_ns) AS lo", "max(ts_ns) AS hi").first()
    finally:
        spark.conf.set(tz_key, "UTC")
    ref = read_table(spark, SF_DIR, "events").selectExpr(
        "min(ts_ns) AS lo", "max(ts_ns) AS hi"
    ).first()
    assert (got.lo, got.hi) == (ref.lo, ref.hi)


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


class TestPartitionProbeCache:
    """ensure_parallelism memoizes its planning probe ONLY for plans
    that still carry the scan's partitioning; a repartitioned frame over
    the same files must neither hit nor poison the scan's memo."""

    def test_scan_is_memoized(self, spark):
        from nlp_with_pyspark_spark.sources import io

        io._PARTITION_PROBE_CACHE.clear()
        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        io.ensure_parallelism(df)
        assert len(io._PARTITION_PROBE_CACHE) == 1
        # second call over the same files serves the memo (no new entry)
        io.ensure_parallelism(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
        assert len(io._PARTITION_PROBE_CACHE) == 1

    def test_post_shuffle_frame_bypasses_memo(self, spark):
        from nlp_with_pyspark_spark.sources import io

        io._PARTITION_PROBE_CACHE.clear()
        scan = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        io.ensure_parallelism(scan)
        (memoed,) = io._PARTITION_PROBE_CACHE.values()
        # a repartition(1) over the same files: must NOT be served the
        # scan's count (which would wrongly skip the repartition guard),
        # and must NOT overwrite the scan's memo with 1
        out = io.ensure_parallelism(scan.repartition(1))
        assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
        assert list(io._PARTITION_PROBE_CACHE.values()) == [memoed]

    def test_split_conf_change_starts_fresh_memo_line(self, spark):
        from nlp_with_pyspark_spark.sources import io

        key = "spark.sql.files.maxPartitionBytes"
        io._PARTITION_PROBE_CACHE.clear()
        old = spark.conf.get(key)
        df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        io.ensure_parallelism(df)
        try:
            spark.conf.set(key, "1048576")
            io.ensure_parallelism(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
            assert len(io._PARTITION_PROBE_CACHE) == 2
        finally:
            spark.conf.set(key, old)

    def test_overflow_clears_instead_of_growing(self, spark):
        from nlp_with_pyspark_spark.sources import io

        io._PARTITION_PROBE_CACHE.clear()
        for i in range(io._PARTITION_PROBE_CACHE_MAX):
            io._PARTITION_PROBE_CACHE[("fake", i)] = 1
        io.ensure_parallelism(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
        assert len(io._PARTITION_PROBE_CACHE) == 1


def test_utc_pin_warns_on_non_utc_session(spark):
    """The UTC pin stays (documented contract) but must warn, not
    silently overwrite, when the caller session had another zone."""
    import warnings

    from nlp_with_pyspark_spark.sources.io import pin_utc_session

    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "America/New_York")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            pin_utc_session(spark)
        assert any("America/New_York" in str(w.message) for w in caught)
        assert spark.conf.get(key) == "UTC"
        # already-UTC session: no warning
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            pin_utc_session(spark)
        assert not caught
    finally:
        spark.conf.set(key, old)


def test_write_small_table_replace_is_atomic_rename(spark, tmp_path):
    """write_small_table overwrites via one atomic rename over a FIXED
    part name: after a rewrite the directory holds exactly one data
    file (no stale siblings), re-reads see the new rows, and a legacy
    foreign-named file is unlinked only after the new data is in place."""
    import os

    from nlp_with_pyspark_spark.sources.io import (
        parquet_data_files,
        write_small_table,
    )

    path = str(tmp_path / "small")
    tbl = "t_small_atomic"
    try:
        write_small_table(spark, [(1, "a")], "id bigint, v string", tbl, path)
        assert len(parquet_data_files(path)) == 1
        first = parquet_data_files(path)[0]
        write_small_table(spark, [(2, "b"), (3, "c")], "id bigint, v string", tbl, path)
        files = parquet_data_files(path)
        assert files == [first], "rewrite must reuse the fixed part name"
        got = sorted(tuple(r) for r in spark.table(tbl).collect())
        assert got == [(2, "b"), (3, "c")]
        # legacy foreign-named file (a Spark-written part) is cleaned up
        legacy = os.path.join(path, "part-99999-legacy.parquet")
        os.link(first, legacy)
        write_small_table(spark, [(4, "d")], "id bigint, v string", tbl, path)
        assert parquet_data_files(path) == [first]
        assert [tuple(r) for r in spark.table(tbl).collect()] == [(4, "d")]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_append_ids_table_guard_falls_back_distributed(spark, tmp_path, monkeypatch):
    """append_ids_table collects at most TAKEDOWN_COLLECT_MAX+1 rows:
    within the bound it appends driver-side; a larger (contract-
    violating) frame degrades to the distributed Spark append with
    identical table contents and return count."""
    from nlp_with_pyspark_spark.sources import io as io_mod

    tbl_small, tbl_big = "t_ids_small", "t_ids_big"
    try:
        df = spark.range(10).select(F.col("id").alias("doc_id"))
        n = io_mod.append_ids_table(
            spark, df, "doc_id bigint", tbl_small, str(tmp_path / "small_ids")
        )
        assert n == 10
        got = sorted(r.doc_id for r in spark.table(tbl_small).collect())
        assert got == list(range(10))

        monkeypatch.setattr(io_mod, "TAKEDOWN_COLLECT_MAX", 4)
        n = io_mod.append_ids_table(
            spark, df, "doc_id bigint", tbl_big, str(tmp_path / "big_ids")
        )
        assert n == 10, "fallback must return the full count"
        got = sorted(r.doc_id for r in spark.table(tbl_big).collect())
        assert got == list(range(10))
        # and appends accumulate on the existing table
        n = io_mod.append_ids_table(
            spark,
            spark.range(10, 14).select(F.col("id").alias("doc_id")),
            "doc_id bigint",
            tbl_big,
            str(tmp_path / "big_ids"),
        )
        assert n == 4
        assert spark.table(tbl_big).count() == 14
    finally:
        for t in (tbl_small, tbl_big):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
