#!/usr/bin/env python
"""Stage decomposition of the WHOLE dedup_maintained_corpus leg
(12.7 s at the r14 baseline): ingest → wave1 → vacuum → wave2 → serve,
replicating the query body with timers (same params)."""

from __future__ import annotations

import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from nlp_with_pyspark_spark.operators.dedup import (  # noqa: E402
    neardup_store_tombstones,
    remove_from_neardup_store,
    vacuum_neardup_store,
)
from nlp_with_pyspark_spark.queries import (  # noqa: E402
    _claim_serving_store,
    _tokenized_documents,
)
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402
from nlp_with_pyspark_spark.streaming.sinks import neardup_upsert_batch  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

A, B = "doc_id % 7 = 0", "doc_id % 11 = 0"


def run():
    t = {}

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        return out

    prefix = "pndl_maint"
    path = _claim_serving_store(
        spark, prefix, ("docs", "buckets", "shingles", "tombstones"), "pndl_store_"
    )
    docs = _tokenized_documents(spark, SF_DIR).select(
        "doc_id", "lang", "n_chars", "tokens"
    )
    step(
        "1_ingest",
        lambda: neardup_upsert_batch(
            docs, path, threshold=0.2, table_prefix=prefix, n_buckets=8
        ),
    )
    step(
        "2_wave1",
        lambda: remove_from_neardup_store(
            spark, docs.where(F.expr(A)).select("doc_id"), prefix
        ),
    )
    step("3_vacuum", lambda: vacuum_neardup_store(spark, prefix, "minhash"))
    step(
        "4_wave2",
        lambda: remove_from_neardup_store(
            spark, docs.where(F.expr(B)).select("doc_id"), prefix
        ),
    )

    def serve():
        live = spark.table(f"{prefix}_docs")
        tombs = neardup_store_tombstones(spark, prefix)
        if tombs is not None:
            live = live.join(
                F.broadcast(tombs.select("doc_id")), "doc_id", "left_anti"
            )
        live.select("doc_id", "lang", "n_chars").write.format("noop").mode(
            "overwrite"
        ).save()

    step("5_serve", serve)
    t["total"] = round(sum(t.values()), 3)
    return t


for i in range(4):
    print(json.dumps({f"run{i}": run()}))
