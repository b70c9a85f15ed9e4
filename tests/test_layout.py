"""Z-order layout + parquet compaction: the claims under test are made
against the ACTUAL parquet footers — a file's [min, max] statistics are
what a scan planner prunes with, so that is what the layout operator
must narrow.
"""

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from nlp_with_pyspark_spark.operators.layout import write_zordered, zorder_key
from nlp_with_pyspark_spark.sources.io import compact_parquet, read_table


def _file_envelopes(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per FILE, from parquet footer statistics."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        los, his = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        out.append((min(los), max(his)))
    return out


def _overlap_fraction(envelopes: list[tuple], lo, hi) -> float:
    n = sum(1 for a, b in envelopes if not (b < lo or a > hi))
    return n / len(envelopes)


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """A Z-ordered write must let a narrow filter on EITHER z column
    skip most files by footer stats, where a random layout skips
    none — and the rewrite must be lossless."""
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    )
    zpath = str(tmp_path / "zorders")
    rpath = str(tmp_path / "rorders")
    write_zordered(orders, zpath, ["o_custkey", "order_day"], n_files=16)
    orders.repartition(16).write.parquet(rpath)

    # losslessness
    a = sorted(r.o_orderkey for r in spark.read.parquet(zpath).select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    assert a == b

    # narrow filters: the middle ~2% of each dimension's range
    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("order_day"), F.max("order_day")
    ).collect()[0]
    ck_lo, ck_hi, d_lo, d_hi = stats
    for col, lo, hi in (
        ("o_custkey", ck_lo, ck_hi),
        ("order_day", d_lo, d_hi),
    ):
        # 30th percentile start: an exact-midpoint slice sits ON the
        # top z-bit boundary and straddles both halves by construction
        mid = lo + (hi - lo) * 3 // 10
        w = max(1, (hi - lo) // 50)
        z = _overlap_fraction(_file_envelopes(zpath, col), mid, mid + w)
        r = _overlap_fraction(_file_envelopes(rpath, col), mid, mid + w)
        # random layout: every file spans ~the full range
        assert r >= 0.9, (col, r)
        # z-order: at most half the files overlap a 2% slice, on BOTH dims
        assert z <= 0.5, (col, z)
        assert z < r


def test_zorder_key_expression_properties(spark):
    """Key bit-interleaving sanity: extremes map to extremes, the key is
    monotone when one dim is fixed, and out-of-bounds values clamp."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (100.0, 100.0), (0.0, 100.0), (50.0, 50.0), (-5.0, 200.0)],
        "x double, y double",
    )
    k = zorder_key([F.col("x"), F.col("y")], [(0.0, 100.0), (0.0, 100.0)], bits=8)
    rows = df.select("x", "y", k.alias("k")).collect()
    got = {(r.x, r.y): r.k for r in rows}
    assert got[(0.0, 0.0)] == 0
    assert got[(100.0, 100.0)] == 2**16 - 1  # all 16 interleaved bits set
    assert got[(-5.0, 200.0)] == got[(0.0, 100.0)]  # clamped to edges
    assert 0 < got[(50.0, 50.0)] < got[(100.0, 100.0)]


def test_measure_bounds_all_null_column_ranks_zero(spark):
    """An all-null (or empty) column has no [min, max]; it must take the
    constant-column path (rank 0 for every row), not surface as a
    TypeError on `hi <= lo` (operators/layout.measure_bounds)."""
    from nlp_with_pyspark_spark.operators.layout import (
        measure_bounds,
        zorder_key,
    )

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "x double, y double"
    )
    bounds = measure_bounds(df, ["x", "y"])
    assert bounds[1] == (0.0, 0.0)
    rows = df.select(
        zorder_key([F.col("x"), F.col("y")], bounds, bits=8).alias("k")
    ).collect()
    # y contributes nothing; x still orders the keys
    assert rows[0].k < rows[1].k

    empty = measure_bounds(df.limit(0), ["x", "y"])
    assert empty == [(0.0, 0.0), (0.0, 0.0)]


def test_compact_parquet_rewrites_atomically(spark, sf_dir, tmp_path):
    """Many tiny files → few target-sized files, same rows, audit dict
    accurate."""
    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "frag")
    docs.repartition(64).write.parquet(path)
    n_before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_before >= 32

    report = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    n_after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert report["files_before"] == n_before
    assert report["files_after"] == n_after
    assert n_after < n_before / 4
    back = spark.read.parquet(path)
    assert back.count() == report["rows"] == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    # no temp/old residue
    assert not os.path.exists(path + ".__compact_tmp")
    assert not os.path.exists(path + ".__compact_old")


def test_compact_parquet_recovers_from_crash_states(spark, sf_dir, tmp_path):
    """The swap is two renames, NOT atomic as a whole: every crash
    point inside it must be recovered at the next call with zero data
    loss (sources/io.compact_parquet entry-time recovery)."""
    import shutil

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n_docs = docs.count()

    def fresh_dir(name: str) -> str:
        path = str(tmp_path / name)
        docs.repartition(8).write.parquet(path)
        return path

    # state A — crash BETWEEN the two renames with a COMPLETE rewrite:
    # path gone, data in __compact_old, finished rewrite in __compact_tmp
    path = fresh_dir("a")
    spark.read.parquet(path).coalesce(1).write.parquet(path + ".__compact_tmp")
    os.rename(path, path + ".__compact_old")
    report = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == report["rows"] == n_docs
    assert not os.path.exists(path + ".__compact_old")

    # state B — crash between the renames with an INCOMPLETE rewrite
    # (no _SUCCESS): roll back to the original data
    path = fresh_dir("b")
    os.makedirs(path + ".__compact_tmp")
    shutil.copy(
        glob.glob(os.path.join(path, "*.parquet"))[0],
        os.path.join(path + ".__compact_tmp", "part-partial.parquet"),
    )
    os.rename(path, path + ".__compact_old")
    report = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == report["rows"] == n_docs

    # state C — crash after the swap completed, before old-dir cleanup
    path = fresh_dir("c")
    shutil.copytree(path, path + ".__compact_old")
    report = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == report["rows"] == n_docs
    assert not os.path.exists(path + ".__compact_old")

    # state D — stale tmp from a crashed rewrite, path intact
    path = fresh_dir("d")
    shutil.copytree(path, path + ".__compact_tmp")
    report = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == report["rows"] == n_docs
    assert not os.path.exists(path + ".__compact_tmp")
