"""Chunking / packing operator contracts (operators/chunking.py).

Oracle parity pins exact output for the registered queries; these pin
the invariants a training pipeline depends on:

  * chunk windows: full coverage (every token in ≥1 chunk), correct
    overlap between neighbors, no chunk starting past the end, short
    docs → exactly one chunk, empty docs → nothing;
  * packing: within a (bucket, pack), total tokens ≤ budget + the one
    allowed overflow doc; pack ids contiguous from 0 per bucket;
    assignment stable under repartitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_with_pyspark_spark.operators.chunking import chunk_tokens, pack_chunks


def _chunks(spark, token_lists, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_lists)], "doc_id long, tokens array<string>"
    )
    out = chunk_tokens(df, **kw).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    return by_doc


def test_chunk_coverage_and_overlap(spark):
    toks = [f"t{i}" for i in range(40)]
    by_doc = _chunks(spark, [toks], chunk_size=16, overlap=4)
    rows = by_doc[0]
    # stride 12, n=40 → ceil(36/12)=3 chunks: [0:16), [12:28), [24:40)
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    texts = [r["chunk_text"].split(" ") for r in rows]
    assert texts[0] == toks[0:16] and texts[1] == toks[12:28] and texts[2] == toks[24:40]
    # coverage: union of chunks = all tokens; overlap = 4 tokens shared
    assert set().union(*map(set, texts)) == set(toks)
    assert texts[0][-4:] == texts[1][:4]


@pytest.mark.parametrize("n", [1, 4, 15, 16])
def test_short_docs_single_chunk(spark, n):
    toks = [f"t{i}" for i in range(n)]
    by_doc = _chunks(spark, [toks], chunk_size=16, overlap=4)
    rows = by_doc[0]
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == n
    assert rows[0]["chunk_text"].split(" ") == toks


def test_empty_docs_emit_nothing(spark):
    by_doc = _chunks(spark, [[]], chunk_size=16, overlap=4)
    assert by_doc == {}


def test_no_chunk_starts_past_end(spark):
    # n=17, stride 12 → chunk 1 starts at 12 (< 17); never a chunk at 24
    by_doc = _chunks(spark, [[f"t{i}" for i in range(17)]], chunk_size=16, overlap=4)
    assert [r["chunk_idx"] for r in by_doc[0]] == [0, 1]
    assert by_doc[0][1]["n_chunk_tokens"] == 5


def test_invalid_overlap_rejected(spark):
    df = spark.createDataFrame([(0, ["a"])], "doc_id long, tokens array<string>")
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=8, overlap=8)


def _counts_df(spark, counts):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, ws_tokens long"
    )


def test_pack_budget_respected_with_one_overflow(spark):
    counts = [30, 100, 40, 90, 25, 60, 80, 10, 55, 70, 20, 45]
    out = pack_chunks(_counts_df(spark, counts), budget=128, n_buckets=2).collect()
    packs = {}
    for r in out:
        packs.setdefault((r["bucket"], r["pack_id"]), []).append(r)
    for (_, _), rows in packs.items():
        total = sum(r["n_tokens"] for r in rows)
        # all but the final (overflow) doc fit the budget
        assert total - max(r["n_tokens"] for r in rows) < 128
    # pack ids contiguous from 0 per bucket
    for b in {r["bucket"] for r in out}:
        ids = sorted({r["pack_id"] for r in out if r["bucket"] == b})
        assert ids == list(range(len(ids)))


def test_pack_stable_under_repartition(spark):
    counts = list(range(1, 60))
    a = {(r["doc_id"], r["pack_id"]) for r in pack_chunks(_counts_df(spark, counts)).collect()}
    b = {
        (r["doc_id"], r["pack_id"])
        for r in pack_chunks(_counts_df(spark, counts).repartition(7)).collect()
    }
    assert a == b


def test_every_doc_packed_exactly_once(spark):
    counts = [10] * 50
    out = pack_chunks(_counts_df(spark, counts), budget=64, n_buckets=4)
    assert out.count() == 50
    assert out.select("doc_id").distinct().count() == 50


def test_pack_and_write_shards_layout_and_roundtrip(spark, sf_dir, tmp_path):
    """One call from corpus to training shards: Hive layout
    bucket=<b>/pack_id=<p>/ with EXACTLY one parquet file per shard
    dir, lossless round-trip, and the streaming-packing budget
    relaxation (a pack overflows only by its crossing document)."""
    import glob
    import os

    from nlp_with_pyspark_spark.operators.chunking import pack_and_write_shards
    from nlp_with_pyspark_spark.operators.textstats import token_counts
    from nlp_with_pyspark_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    counted = token_counts(docs).join(docs.select("doc_id", "text"), "doc_id")
    out = str(tmp_path / "shards")
    pack_and_write_shards(
        counted, out, budget=256, n_buckets=4, payload_cols=["text"]
    )

    back = spark.read.parquet(out)
    # lossless round-trip of ids + payload
    orig = sorted((r.doc_id, r.text) for r in docs.select("doc_id", "text").collect())
    got = sorted((r.doc_id, r.text) for r in back.select("doc_id", "text").collect())
    assert got == orig

    # layout: every shard dir holds exactly one parquet part file, and
    # the dir set matches the computed assignment exactly
    expected = {
        (r.bucket, r.pack_id)
        for r in pack_chunks(counted, budget=256, n_buckets=4)
        .select("bucket", "pack_id")
        .distinct()
        .collect()
    }
    seen = set()
    for bdir in glob.glob(os.path.join(out, "bucket=*")):
        b = int(bdir.rsplit("=", 1)[1])
        for pdir in glob.glob(os.path.join(bdir, "pack_id=*")):
            p = int(pdir.rsplit("=", 1)[1])
            parts = glob.glob(os.path.join(pdir, "*.parquet"))
            assert len(parts) == 1, (pdir, parts)
            seen.add((b, p))
    assert seen == expected and len(seen) > 4

    # budget relaxation: pack total minus its last (crossing) doc's
    # tokens stays under the budget
    stats = (
        back.groupBy("bucket", "pack_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max(F.struct("doc_id", "n_tokens")).alias("last"),
        )
        .collect()
    )
    assert all(r.total - r.last.n_tokens < 256 for r in stats)
