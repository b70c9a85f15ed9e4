#!/usr/bin/env python
"""Warm steady-state stage decomposition for the lifecycle bench legs.

Times each stage of a lifecycle query's body separately, AFTER two full
warm passes (the bench's protocol), so the numbers attribute the warm
iso median rather than cold-JVM compile cost.

Usage: python tools_r13/stage_probe.py <leg> [runs]
  leg in {vec_maint, vec_merged, vec_retrained, vec_filtered,
          vec_rebalance, bm25_maint, nd_maint, rerank}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self):
        self.stages: dict[str, list[float]] = {}

    def __call__(self, name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        self.stages.setdefault(name, []).append(round(dt, 3))
        return out

    def report(self):
        return {k: v for k, v in self.stages.items()}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def vec_lifecycle(spark, t, variant):
    from pyspark.sql import functions as F

    from nlp_with_pyspark_spark.operators.similarity import pq_fixed_codebooks
    from nlp_with_pyspark_spark.operators.vector_store import (
        load_vector_index,
        merge_vector_indexes,
        persist_vector_index,
        rebalance_vector_index,
        remove_from_vector_index,
        retrain_vector_index,
        vacuum_vector_index,
        vector_index_list_stats,
        vector_index_rerank_topk,
    )
    from nlp_with_pyspark_spark.queries import (
        _VEC_DEAD_A,
        _VEC_DEAD_B,
        _VEC_RETRAIN_CENT,
        _claim_serving_store,
    )
    from nlp_with_pyspark_spark.sources.io import read_table

    prefix = "probe_vec"
    tables = (
        ("codes", "vecs", "centroids", "codebooks", "tombstones",
         "src_codes", "src_vecs", "src_centroids", "src_codebooks",
         "src_tombstones")
    )
    path = t("claim", lambda: _claim_serving_store(spark, prefix, tables, "probe_vec_"))
    emb = read_table(spark, SF_DIR, "embeddings")
    cent_rows = t("collect_centroids", lambda: emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect())
    centroids = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in cent_rows]
    cbs = pq_fixed_codebooks()
    if variant == "vec_merged":
        t("persist_half_a", lambda: persist_vector_index(
            emb.where(F.col("vec_id") % 2 == 0), centroids, cbs, prefix, n_buckets=8, path=f"{path}/a"))
        t("persist_half_b", lambda: persist_vector_index(
            emb.where(F.col("vec_id") % 2 == 1), centroids, cbs, f"{prefix}_src", n_buckets=8, path=f"{path}/b"))
        t("merge", lambda: merge_vector_indexes(spark, prefix, f"{prefix}_src"))
    else:
        t("persist", lambda: persist_vector_index(emb, centroids, cbs, prefix, n_buckets=8, path=path))
    if variant == "vec_maint":
        t("remove_wave_a", lambda: remove_from_vector_index(
            spark, emb.where(F.expr(_VEC_DEAD_A)).select("vec_id"), prefix))
        t("vacuum", lambda: vacuum_vector_index(spark, prefix))
        t("remove_wave_b", lambda: remove_from_vector_index(
            spark, emb.where(F.expr(_VEC_DEAD_B)).select("vec_id"), prefix))
    if variant == "vec_retrained":
        new_rows = t("collect_retrain_cents", lambda: emb.where(F.expr(_VEC_RETRAIN_CENT)).select("vec_id", "embedding").collect())
        t("retrain", lambda: retrain_vector_index(
            spark, prefix,
            centroids=[(int(r.vec_id), [float(x) for x in r.embedding])
                       for r in sorted(new_rows, key=lambda r: r.vec_id)]))
    if variant == "vec_rebalance":
        before = t("stats_before", lambda: vector_index_list_stats(spark, prefix).localCheckpoint())
        dirv = [float(x) for x in emb.where(F.col("vec_id") == 11).head().embedding]
        t("rebalance", lambda: rebalance_vector_index(spark, prefix, max_list_factor=1.05, direction=dirv))
        t("stats_after+mat", lambda: _noop(before.unionByName(vector_index_list_stats(spark, prefix))))
        return
    idx = t("load", lambda: load_vector_index(spark, prefix))
    allowed = emb.where(F.col("vec_id") % 3 != 0).select("vec_id") if variant == "vec_filtered" else None
    t("serve+mat", lambda: _noop(vector_index_rerank_topk(
        idx, emb.where(F.col("vec_id") < 5), k=10, shortlist=50, n_probe=3, allowed=allowed)))


def bm25_maint(spark, t, variant):
    from pyspark.sql import functions as F

    from nlp_with_pyspark_spark.operators.search import (
        bm25_topk_indexed,
        build_posting_index,
        load_posting_index,
        persist_posting_index,
        remove_from_posting_index,
        vacuum_posting_index,
    )
    from nlp_with_pyspark_spark.queries import (
        _BM25_B,
        _BM25_DEAD_A,
        _BM25_DEAD_B,
        _BM25_K1,
        _BM25_TERMS,
        _claim_serving_store,
        _tokenized_documents,
    )

    prefix = "probe_bm25"
    path = t("claim", lambda: _claim_serving_store(
        spark, prefix, ("postings", "docs", "stats", "tombstones"), "probe_bm25_"))
    docs = _tokenized_documents(spark, SF_DIR)
    t("build+persist", lambda: persist_posting_index(build_posting_index(docs), prefix, n_buckets=8, path=path))
    t("remove_wave_a", lambda: remove_from_posting_index(
        spark, docs.where(F.expr(_BM25_DEAD_A)).select("doc_id"), prefix))
    t("vacuum", lambda: vacuum_posting_index(spark, prefix))
    t("remove_wave_b", lambda: remove_from_posting_index(
        spark, docs.where(F.expr(_BM25_DEAD_B)).select("doc_id"), prefix))
    t("serve+mat", lambda: _noop(bm25_topk_indexed(
        load_posting_index(spark, prefix), list(_BM25_TERMS), k=15, k1=_BM25_K1, b=_BM25_B)))


def nd_maint(spark, t, variant):
    from pyspark.sql import functions as F

    from nlp_with_pyspark_spark.operators.dedup import (
        neardup_store_tombstones,
        remove_from_neardup_store,
        vacuum_neardup_store,
    )
    from nlp_with_pyspark_spark.queries import (
        _ND_DEAD_A,
        _ND_DEAD_B,
        _claim_serving_store,
        _tokenized_documents,
    )
    from nlp_with_pyspark_spark.streaming.sinks import neardup_upsert_batch

    prefix = "probe_nd"
    path = t("claim", lambda: _claim_serving_store(
        spark, prefix, ("docs", "buckets", "shingles", "tombstones"), "probe_nd_"))
    docs = _tokenized_documents(spark, SF_DIR).select("doc_id", "lang", "n_chars", "tokens")
    t("ingest", lambda: neardup_upsert_batch(docs, path, threshold=0.2, table_prefix=prefix, n_buckets=8))
    t("remove_wave_a", lambda: remove_from_neardup_store(
        spark, docs.where(F.expr(_ND_DEAD_A)).select("doc_id"), prefix))
    t("vacuum", lambda: vacuum_neardup_store(spark, prefix, "minhash"))
    t("remove_wave_b", lambda: remove_from_neardup_store(
        spark, docs.where(F.expr(_ND_DEAD_B)).select("doc_id"), prefix))

    def serve():
        live = spark.table(f"{prefix}_docs")
        tombs = neardup_store_tombstones(spark, prefix)
        if tombs is not None:
            live = live.join(F.broadcast(tombs.select("doc_id")), "doc_id", "left_anti")
        _noop(live.select("doc_id", "lang", "n_chars"))

    t("serve+mat", serve)


LEGS = {
    "vec_maint": (vec_lifecycle, "vec_maint"),
    "vec_merged": (vec_lifecycle, "vec_merged"),
    "vec_retrained": (vec_lifecycle, "vec_retrained"),
    "vec_filtered": (vec_lifecycle, "vec_filtered"),
    "vec_rebalance": (vec_lifecycle, "vec_rebalance"),
    "bm25_maint": (bm25_maint, None),
    "nd_maint": (nd_maint, None),
}


def main():
    leg = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fn, variant = LEGS[leg]
    from nlp_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name=f"stage-probe-{leg}")
    spark.sparkContext.setLogLevel("ERROR")
    # two warms (bench protocol), then `runs` timed passes
    warm = T()
    fn(spark, warm, variant)
    fn(spark, warm, variant)
    t = T()
    totals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, t, variant)
        totals.append(round(time.perf_counter() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in t.report().items()}
    print(json.dumps({
        "leg": leg,
        "stage_med": med,
        "stage_sum": round(sum(med.values()), 3),
        "totals": totals,
        "spreads": t.report(),
        "cold_first_pass": {k: v[0] for k, v in warm.report().items()},
    }, indent=1))


if __name__ == "__main__":
    main()
