"""Persisted IVF-PQ vector store (operators/vector_store): the fifth
store family's full lifecycle — serve ≡ the inline two-stage retrieval,
takedown ≡ rebuild-without, vacuum physically folds, re-ingest of a
forgotten vector is admitted, tombstones restart-heal, the streaming
ingest sink converges under replay, and the takedown fan-out drives the
vector store from the same id stream as every other family."""

import pytest
from pyspark.sql import functions as F

from nlp_with_pyspark_spark.operators.similarity import (
    ivfpq_rerank_topk,
    pq_fixed_codebooks,
)
from nlp_with_pyspark_spark.operators.vector_store import (
    append_to_vector_index,
    load_vector_index,
    persist_vector_index,
    remove_from_vector_index,
    vacuum_vector_index,
    vector_index_rerank_topk,
    vector_index_tombstones,
)
from nlp_with_pyspark_spark.plans.inspect import final_plan_string
from nlp_with_pyspark_spark.sources.io import read_table

STORE_TABLES = ("codes", "vecs", "centroids", "codebooks", "tombstones")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").localCheckpoint()


@pytest.fixture(scope="module")
def quantizer(emb):
    cent = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 8).collect()
    ]
    return cent, pq_fixed_codebooks()


def _drop(spark, prefix):
    for t in STORE_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _serve(spark, prefix, queries):
    return vector_index_rerank_topk(
        load_vector_index(spark, prefix), queries, k=10, shortlist=50, n_probe=3
    )


def test_store_serve_equals_inline_rerank_and_prunes(
    spark, emb, quantizer, tmp_path
):
    """Serving from the persisted store is row-identical to the inline
    similarity.ivfpq_rerank_topk over the same corpus, and the serve
    plan reads only the probed lists: the literal IN-filter on list_id
    is pushed into the bucketed-sorted-by-list_id parquet scan (footer
    pruning — the IVF layout promise), and the probe/candidate joins
    are broadcasts (the store side never shuffles pre-shortlist)."""
    cent, cbs = quantizer
    prefix = "t_vstore_serve"
    queries = emb.where(F.col("vec_id") < 5)
    try:
        persist_vector_index(emb, cent, cbs, prefix, n_buckets=8, path=str(tmp_path / "s"))
        served = _serve(spark, prefix, queries)
        assert _rows(served) == _rows(
            ivfpq_rerank_topk(emb, queries, cent, cbs, k=10, shortlist=50, n_probe=3)
        )
        plan = final_plan_string(served).split("== Initial Plan ==")[0]
        # the codes scan carries the probed-list filter down to parquet
        assert "PushedFilters: [In(list_id" in plan or "PushedFilters: [EqualTo(list_id" in plan
        assert "BroadcastHashJoin" in plan
    finally:
        _drop(spark, prefix)


def test_takedown_lifecycle_delete_vacuum_reingest(spark, emb, quantizer, tmp_path):
    """The LSM maintenance contract, end to end: (1) a takedown wave is
    served as if the index were rebuilt without the dead vectors —
    next-best candidates fill the freed shortlist slots; (2) deletes
    are idempotent and ignore never-ingested ids; (3) a tombstoned id
    is suppressed on re-ingest (the ledger still holds it); (4) vacuum
    preserves answers, leaves codes+vecs bit-identical to a rebuild
    without the dead vectors, and clears the tombstone list; (5) after
    the vacuum a re-ingest of the forgotten vector is admitted as a
    first occurrence, and replaying the same append is a no-op."""
    cent, cbs = quantizer
    prefix = "t_vstore_life"
    rebuilt = "t_vstore_rebuilt"
    queries = emb.where(F.col("vec_id") < 5)
    dead = emb.where(
        (F.col("vec_id") >= 5) & (F.col("vec_id") % 7 == 1)
    ).select("vec_id").localCheckpoint()
    live = emb.join(dead, "vec_id", "left_anti")
    try:
        persist_vector_index(emb, cent, cbs, prefix, n_buckets=8, path=str(tmp_path / "a"))
        before = _rows(_serve(spark, prefix, queries))

        n = remove_from_vector_index(spark, dead, prefix)
        assert n == dead.count() > 0
        # idempotent; never-ingested ids ignored
        assert remove_from_vector_index(spark, dead, prefix) == 0
        assert remove_from_vector_index(spark, [10**12], prefix) == 0

        after = _rows(_serve(spark, prefix, queries))
        assert after != before  # a true top-k neighbor died
        assert after == _rows(
            ivfpq_rerank_topk(live, queries, cent, cbs, k=10, shortlist=50, n_probe=3)
        )
        dead_ids = {r.vec_id for r in dead.collect()}
        assert not ({r[1] for r in after} & dead_ids)

        # tombstoned id re-ingest PRE-vacuum is suppressed (ledger guard)
        resurrect = emb.join(F.broadcast(dead.limit(2)), "vec_id", "left_semi")
        assert append_to_vector_index(resurrect, prefix) == 0

        rep = vacuum_vector_index(spark, prefix)
        assert rep["tombstones_folded"] == n
        assert vector_index_tombstones(spark, prefix) is None
        assert _rows(_serve(spark, prefix, queries)) == after
        # physical fold ≡ rebuild-without, per table
        persist_vector_index(live, cent, cbs, rebuilt, n_buckets=8, path=str(tmp_path / "b"))
        for t in ("codes", "vecs"):
            assert _rows(spark.table(f"{prefix}_{t}")) == _rows(
                spark.table(f"{rebuilt}_{t}")
            ), t

        # POST-vacuum the forgotten vector is admitted again; replay no-op
        assert append_to_vector_index(resurrect, prefix) == 2
        assert append_to_vector_index(resurrect, prefix) == 0
        back = _rows(_serve(spark, prefix, queries))
        live_plus = live.unionByName(
            emb.join(F.broadcast(dead.limit(2)), "vec_id", "left_semi")
        )
        assert back == _rows(
            ivfpq_rerank_topk(live_plus, queries, cent, cbs, k=10, shortlist=50, n_probe=3)
        )
    finally:
        _drop(spark, prefix)
        _drop(spark, rebuilt)


def test_trained_quantizer_store_roundtrip(spark, emb, tmp_path):
    """The production build path: train_and_persist_vector_index trains
    k-means centroids + PQ codebooks (on a hash-sample) and persists —
    the store must then serve row-identically to the inline two-stage
    retrieval run with the SAME loaded artifacts (the persist/load path
    handles arbitrary trained quantizers, not just the md5 literals),
    and the takedown machinery works unchanged on a trained store."""
    from nlp_with_pyspark_spark.operators.vector_store import (
        train_and_persist_vector_index,
    )

    prefix = "t_vstore_trained"
    queries = emb.where(F.col("vec_id") < 5)
    try:
        train_and_persist_vector_index(
            emb, prefix, n_lists=8, m=8, ksub=4,
            path=str(tmp_path / "t"), train_fraction=0.5,
        )
        idx = load_vector_index(spark, prefix)
        assert len(idx.centroids) == 8
        assert len(idx.codebooks) == 8 and len(idx.codebooks[0]) == 4
        served = _rows(_serve(spark, prefix, queries))
        assert served == _rows(
            ivfpq_rerank_topk(
                emb, queries, idx.centroids, idx.codebooks,
                k=10, shortlist=50, n_probe=3,
            )
        )
        # takedowns are quantizer-agnostic: delete ≡ rebuild-without
        dead = emb.where(
            (F.col("vec_id") >= 5) & (F.col("vec_id") % 5 == 0)
        ).select("vec_id")
        remove_from_vector_index(spark, dead, prefix)
        assert _rows(_serve(spark, prefix, queries)) == _rows(
            ivfpq_rerank_topk(
                emb.join(dead, "vec_id", "left_anti"), queries,
                idx.centroids, idx.codebooks, k=10, shortlist=50, n_probe=3,
            )
        )
    finally:
        _drop(spark, prefix)


def test_full_store_restart_selfheal(spark, emb, quantizer, tmp_path):
    """A fresh session (EVERY catalog entry gone, on-disk store intact)
    must serve the committed state exactly — including a still-pending
    takedown: register_vector_index re-registers codes/vecs from their
    _BUCKET_SPEC sidecars, the quantizer tables from their footers, and
    the tombstones from the __tombstones sidecar. Also: dropping ONLY
    the tombstone entry (the partial-restart path) heals through
    vector_index_tombstones alone."""
    from nlp_with_pyspark_spark.operators.vector_store import (
        register_vector_index,
    )

    cent, cbs = quantizer
    prefix = "t_vstore_heal"
    store = str(tmp_path / "h")
    queries = emb.where(F.col("vec_id") < 5)
    dead = emb.where(
        (F.col("vec_id") >= 5) & (F.col("vec_id") % 7 == 1)
    ).select("vec_id")
    try:
        persist_vector_index(emb, cent, cbs, prefix, n_buckets=8, path=store)
        remove_from_vector_index(spark, dead, prefix)
        served = _rows(_serve(spark, prefix, queries))

        # partial restart: only the tombstone entry is gone
        spark.sql(f"DROP TABLE {prefix}_tombstones")
        tombs = vector_index_tombstones(spark, prefix)
        assert tombs is not None and tombs.count() == dead.count()
        assert _rows(_serve(spark, prefix, queries)) == served

        # full restart: every catalog entry gone, disk intact
        _drop(spark, prefix)
        register_vector_index(spark, prefix, store, n_buckets=8)
        idx = load_vector_index(spark, prefix)
        assert idx.centroids == cent and idx.tombstones is not None
        assert _rows(_serve(spark, prefix, queries)) == served
    finally:
        _drop(spark, prefix)


def test_rerank_shortlist_guard(spark, emb, quantizer, tmp_path):
    """Store serving validates shortlist >= k exactly like the inline
    similarity.ivfpq_rerank_topk it is pinned row-identical to — a
    too-small shortlist must raise, not silently truncate results."""
    cent, cbs = quantizer
    prefix = "t_vstore_guard"
    queries = emb.where(F.col("vec_id") < 2)
    try:
        persist_vector_index(emb, cent, cbs, prefix, n_buckets=8, path=str(tmp_path / "g"))
        idx = load_vector_index(spark, prefix)
        with pytest.raises(ValueError, match="shortlist"):
            vector_index_rerank_topk(idx, queries, k=10, shortlist=5)
    finally:
        _drop(spark, prefix)


def test_append_scrubs_stale_tombstone_after_crashed_vacuum(
    spark, emb, quantizer, tmp_path
):
    """The vacuum crash window (died after the physical folds, before
    the tombstone clear) must not invisibly shadow a re-ingest: the
    stale tombstone row — an id the ledger no longer holds — is
    scrubbed by append_to_vector_index when it admits that id, so the
    re-ingested vector serves immediately and the next vacuum folds
    nothing."""
    cent, cbs = quantizer
    prefix = "t_vstore_crashwin"
    queries = emb.where(F.col("vec_id") < 5)
    dead = emb.where(
        (F.col("vec_id") >= 5) & (F.col("vec_id") % 7 == 1)
    ).select("vec_id").localCheckpoint()
    try:
        persist_vector_index(emb, cent, cbs, prefix, n_buckets=8, path=str(tmp_path / "c"))
        full = _rows(_serve(spark, prefix, queries))
        remove_from_vector_index(spark, dead, prefix)
        vacuum_vector_index(spark, prefix)
        # simulate the crash: the folds completed, the clear did not —
        # re-insert the tombstone rows over the already-folded ids
        dead.write.mode("append").format("parquet").saveAsTable(
            f"{prefix}_tombstones"
        )
        spark.catalog.refreshTable(f"{prefix}_tombstones")
        assert vector_index_tombstones(spark, prefix) is not None

        resurrect = emb.join(F.broadcast(dead), "vec_id", "left_semi")
        assert append_to_vector_index(resurrect, prefix) == dead.count()
        # the stale rows are gone and the re-ingested vectors serve NOW
        assert vector_index_tombstones(spark, prefix) is None
        assert _rows(_serve(spark, prefix, queries)) == full
        # the next vacuum has nothing to fold — the window left no debt
        assert vacuum_vector_index(spark, prefix)["tombstones_folded"] == 0
        assert _rows(_serve(spark, prefix, queries)) == full
    finally:
        _drop(spark, prefix)


def test_register_recovers_nondefault_bucket_count(spark, emb, quantizer, tmp_path):
    """register_vector_index reads (bucket_col, n_buckets) from each
    table's _BUCKET_SPEC sidecar, so a store built with a non-default
    bucket count recovers with the default call — the caller never has
    to remember the build-time value."""
    from nlp_with_pyspark_spark.operators.vector_store import register_vector_index
    from nlp_with_pyspark_spark.sources.io import table_bucket_spec

    cent, cbs = quantizer
    prefix = "t_vstore_nb"
    store = str(tmp_path / "nb")
    queries = emb.where(F.col("vec_id") < 5)
    try:
        persist_vector_index(emb, cent, cbs, prefix, n_buckets=4, path=store)
        served = _rows(_serve(spark, prefix, queries))
        _drop(spark, prefix)
        register_vector_index(spark, prefix, store)  # default n_buckets=8
        assert table_bucket_spec(spark, f"{prefix}_codes")[:2] == ("list_id", 4)
        assert table_bucket_spec(spark, f"{prefix}_vecs")[:2] == ("vec_id", 4)
        assert _rows(_serve(spark, prefix, queries)) == served
    finally:
        _drop(spark, prefix)


def test_streaming_ingest_sink_converges(spark, emb, quantizer, tmp_path):
    """Two micro-batches through vector_index_sink build the same store
    as a one-shot persist of their union (codes AND vecs tables
    row-identical), and a full replay against a fresh checkpoint
    changes nothing — foreachBatch at-least-once convergence."""
    from nlp_with_pyspark_spark.streaming.sinks import vector_index_sink

    cent, cbs = quantizer
    prefix = "t_vstore_sink"
    oneshot = "t_vstore_oneshot"
    src = tmp_path / "vecs_in"
    src.mkdir()
    half = emb.where(F.col("vec_id") % 2 == 0)
    other = emb.where(F.col("vec_id") % 2 == 1)
    half.select("vec_id", "embedding").coalesce(1).write.parquet(str(src / "b0"))
    other.select("vec_id", "embedding").coalesce(1).write.parquet(str(src / "b1"))
    store = str(tmp_path / "store")

    def run(ck):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "b*"))
        )
        vector_index_sink(
            stream, store, str(tmp_path / ck), cent, cbs, prefix, n_buckets=8
        )

    try:
        run("ck1")
        persist_vector_index(
            emb, cent, cbs, oneshot, n_buckets=8, path=str(tmp_path / "o")
        )
        for t in ("codes", "vecs"):
            assert _rows(spark.table(f"{prefix}_{t}")) == _rows(
                spark.table(f"{oneshot}_{t}")
            ), t
        snap = _rows(spark.table(f"{prefix}_vecs"))
        run("ck2")  # full replay, fresh checkpoint
        assert _rows(spark.table(f"{prefix}_vecs")) == snap
    finally:
        _drop(spark, prefix)
        _drop(spark, oneshot)


def test_fanout_drives_vector_store(spark, sf_dir, emb, quantizer, tmp_path):
    """One takedown-id stream converges the vector store alongside a
    text-side store through takedown_fanout_sink's new 'vector' kind:
    after the drain both stores have tombstoned exactly the dead ids,
    ANN stops retrieving them, and a full replay against a fresh
    checkpoint re-tombstones nothing anywhere."""
    from nlp_with_pyspark_spark.queries import _tokenized_documents
    from nlp_with_pyspark_spark.streaming.sinks import (
        neardup_upsert_batch,
        takedown_fanout_sink,
    )
    from nlp_with_pyspark_spark.operators.dedup import neardup_store_tombstones

    cent, cbs = quantizer
    vprefix = "t_fanv_vec"
    ndx = "t_fanv_nd"
    queries = emb.where(F.col("vec_id") < 5)
    try:
        persist_vector_index(emb, cent, cbs, vprefix, n_buckets=8, path=str(tmp_path / "v"))
        toks = _tokenized_documents(spark, sf_dir).select(
            "doc_id", "lang", "n_chars", "tokens"
        )
        neardup_upsert_batch(
            toks, str(tmp_path / "nd"), threshold=0.2, table_prefix=ndx, n_buckets=8
        )
        # dead ids present in BOTH stores (vec_id shares the doc id space)
        dead = sorted(
            r.vec_id
            for r in emb.join(
                spark.table(f"{ndx}_docs").select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
            .where(F.col("vec_id") >= 5)
            .limit(6)
            .collect()
        )
        src = tmp_path / "ids"
        src.mkdir()
        half = len(dead) // 2
        for i, chunk in enumerate((dead[:half], dead[half:])):
            spark.createDataFrame(
                [(int(d),) for d in chunk], "doc_id long"
            ).coalesce(1).write.parquet(str(src / f"b{i}"))
        targets = [
            {"kind": "neardup", "table_prefix": ndx, "hash_family": "minhash"},
            {"kind": "vector", "table_prefix": vprefix},
        ]

        def run(ck):
            stream = (
                spark.readStream.schema("doc_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src / "b*"))
            )
            takedown_fanout_sink(stream, targets, str(tmp_path / ck))

        run("ck1")
        vt = vector_index_tombstones(spark, vprefix)
        assert sorted(r.vec_id for r in vt.collect()) == dead
        assert sorted(
            r.doc_id for r in neardup_store_tombstones(spark, ndx).collect()
        ) == dead
        served = _rows(_serve(spark, vprefix, queries))
        assert not ({r[1] for r in served} & set(dead))
        assert served == _rows(
            ivfpq_rerank_topk(
                emb.where(~F.col("vec_id").isin([int(d) for d in dead])),
                queries, cent, cbs, k=10, shortlist=50, n_probe=3,
            )
        )
        run("ck2")  # replay: both stores unchanged
        assert sorted(
            r.vec_id for r in vector_index_tombstones(spark, vprefix).collect()
        ) == dead
        assert _rows(_serve(spark, vprefix, queries)) == served
    finally:
        _drop(spark, vprefix)
        for t in ("docs", "buckets", "shingles", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {ndx}_{t}")
