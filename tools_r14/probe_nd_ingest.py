#!/usr/bin/env python
"""Micro-decomposition of neardup_upsert_batch's FIRST-batch ingest
(the 5.7 s warm stage of dedup_maintained_corpus) — replicates the
sink's body step by step with timers, same params as the query
(threshold=0.2, n_buckets=8, minhash defaults n=3 k=12 bands=4)."""

from __future__ import annotations

import json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from nlp_with_pyspark_spark.operators import dedup as D  # noqa: E402
from nlp_with_pyspark_spark.operators.graph import connected_components  # noqa: E402
from nlp_with_pyspark_spark.queries import _tokenized_documents  # noqa: E402
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402
from nlp_with_pyspark_spark.sources.io import write_bucketed  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

N, K, BANDS, THRESH, NB = 3, 12, 4, 0.2, 8


def run(tag):
    t = {}

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        return out

    base = tempfile.mkdtemp(prefix="probe_ndi_")
    docs = _tokenized_documents(spark, SF_DIR).select(
        "doc_id", "lang", "n_chars", "tokens"
    )
    fresh = step("A_fresh_ckpt", lambda: docs.dropDuplicates(["doc_id"]).localCheckpoint())
    step("B_limit1", lambda: fresh.limit(1).count())
    delta_feats = step(
        "C_shingles_ckpt",
        lambda: D._shingle_sets(fresh, "tokens", "doc_id", N).localCheckpoint(),
    )
    delta_keys = step(
        "D_bands_ckpt",
        lambda: D._band_buckets_from_shingles(delta_feats, K, BANDS, "md5").localCheckpoint(),
    )
    empty_keys = delta_keys.limit(0)
    empty_feats = delta_feats.limit(0)
    pairs = D.minhash_delta_pairs(
        fresh,
        D.MinhashIndex(buckets=empty_keys, shingles=empty_feats),
        tokens_col="tokens", id_col="doc_id", n=N, k=K, bands=BANDS,
        threshold=THRESH, max_docs_per_bucket=1000, hash_fn="md5",
        delta_shingles=delta_feats, delta_bands=delta_keys,
    )
    asg = step(
        "E_components",
        lambda: connected_components(pairs, src="doc_a", dst="doc_b").join(
            fresh.select(F.col("doc_id").alias("node"), F.lit(1).alias("is_delta")),
            "node", "left",
        ),
    )
    comp_stats = asg.groupBy("component").agg(
        F.max(F.when(F.col("is_delta").isNull(), 1).otherwise(0)).alias("has_index"),
        F.min(F.when(F.col("is_delta") == 1, F.col("node"))).alias("min_delta"),
    )
    drops = (
        asg.where(F.col("is_delta") == 1)
        .join(comp_stats, "component")
        .where((F.col("has_index") == 1) | (F.col("node") != F.col("min_delta")))
        .select(F.col("node").alias("doc_id"))
    )
    survivors = step(
        "F_survivors_ckpt",
        lambda: fresh.join(drops, "doc_id", "left_anti").localCheckpoint(),
    )
    surv_ids = survivors.select("doc_id")
    new_keys = delta_keys.join(surv_ids, "doc_id", "left_semi")
    new_feats = delta_feats.join(surv_ids, "doc_id", "left_semi")
    from concurrent.futures import ThreadPoolExecutor

    def writes():
        with ThreadPoolExecutor(max_workers=2) as pool:
            fk = pool.submit(
                write_bucketed, new_keys, f"pndi_{tag}_keys", "band_hash", NB,
                path=f"{base}/keys",
            )
            ff = pool.submit(
                write_bucketed, new_feats, f"pndi_{tag}_sh", "doc_id", NB,
                path=f"{base}/sh",
            )
            fk.result(); ff.result()

    step("G_index_writes", writes)
    step(
        "H_docs_write",
        lambda: write_bucketed(survivors, f"pndi_{tag}_docs", "doc_id", NB, path=f"{base}/docs"),
    )
    for s in ("keys", "sh", "docs"):
        spark.sql(f"DROP TABLE IF EXISTS pndi_{tag}_{s}")
    shutil.rmtree(base, ignore_errors=True)
    t["total"] = round(sum(v for k, v in t.items()), 3)
    return t


for i in range(4):
    print(json.dumps({"run%d" % i: run("r%d" % i)}))
