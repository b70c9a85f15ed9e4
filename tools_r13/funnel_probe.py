#!/usr/bin/env python
"""Warm stage decomposition of the funnel + dsir + quantile query legs.

Times each materialization seam of the query bodies separately, AFTER
two full warm passes (the bench protocol), attributing the warm iso
median. Usage: python tools_r13/funnel_probe.py <leg> [runs]
  leg in {curation, full, dsir_topk, quantiles}
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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def curation(spark, t):
    from pyspark.sql import functions as F

    from nlp_with_pyspark_spark.operators.pipeline import CURATION_STAGES
    from nlp_with_pyspark_spark.operators.selection import dsir_scores
    from nlp_with_pyspark_spark.operators.sketch import exact_quantiles
    from nlp_with_pyspark_spark.operators.textstats import quality_score_expr
    from nlp_with_pyspark_spark.queries import _tokenized_documents

    from nlp_with_pyspark_spark.operators.selection import features_expr

    docs = t("tokenize_ckpt", lambda: _tokenized_documents(spark, SF_DIR)
             .select("doc_id", "lang", "text", "tokens").localCheckpoint())
    corpus, target = docs, docs.where(F.col("lang") == "en")
    flagged = corpus.select(
        "doc_id", F.col("tokens"), quality_score_expr(F.col("text")).alias("__qs"))
    survivors = t("survivors_ckpt", lambda: flagged
                  .where(F.col("__qs") >= 0.72)
                  .select("doc_id", features_expr("tokens").alias("__feats"))
                  .localCheckpoint())
    scored = t("dsir_score_ckpt", lambda: dsir_scores(
        survivors, target.select(features_expr("tokens").alias("__feats")),
        features_col="__feats").localCheckpoint())
    qrows = t("quantile", lambda: exact_quantiles(scored, "dsir_score", [0.5]).collect())
    kept = scored.where(F.col("dsir_score") >= float(qrows[0]["value"]))

    def stage(idx, name, df):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "n_docs")

    frames = {"raw": corpus, "quality": scored, "dsir_selected": kept}
    out = None
    for i, name in CURATION_STAGES:
        s = stage(i, name, frames[name])
        out = s if out is None else out.unionByName(s)
    t("counts+mat", lambda: _noop(out))


def full(spark, t):
    from pyspark.sql import functions as F

    from nlp_with_pyspark_spark.operators.pipeline import (
        FULL_FUNNEL_STAGES,
        _hygiene_conds,
        _hygiene_flags,
        _stage_counts,
    )
    from nlp_with_pyspark_spark.operators.selection import dsir_scores
    from nlp_with_pyspark_spark.operators.sketch import exact_quantiles
    from nlp_with_pyspark_spark.queries import _tokenized_documents

    docs = t("tokenize_ckpt", lambda: _tokenized_documents(spark, SF_DIR)
             .select("doc_id", "lang", "text", "tokens").localCheckpoint())
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    target = docs.where(F.col("lang") == "en")

    # _hygiene_flags internals, timed seam by seam
    from nlp_with_pyspark_spark.operators.dedup import _shingle_sets, minhash_dedup_pairs
    from nlp_with_pyspark_spark.operators.decontam import benchmark_overlap
    from nlp_with_pyspark_spark.operators.graph import connected_components
    from nlp_with_pyspark_spark.operators.textstats import (
        is_repetitive_expr,
        quality_score_expr,
    )

    shingles = t("shingles_ckpt", lambda: _shingle_sets(corpus, "tokens", "doc_id").localCheckpoint())
    pairs = t("minhash_pairs_ckpt", lambda: minhash_dedup_pairs(
        corpus, tokens_col="tokens", threshold=0.2, shingles=shingles).localCheckpoint())
    dropped = t("components", lambda: connected_components(pairs, src="doc_a", dst="doc_b")
                .where(F.col("node") != F.col("component"))
                .select(F.col("node").alias("doc_id"), F.lit(1).alias("is_dropped")))
    contaminated = (
        benchmark_overlap(corpus, bench, threshold=0.5, corpus_shingles=shingles)
        .select("doc_id").distinct().withColumn("is_contaminated", F.lit(1)))
    flags = t("flags_ckpt", lambda: (
        corpus.select(
            "doc_id",
            quality_score_expr(F.col("text")).alias("quality_score"),
            is_repetitive_expr(F.col("text")).alias("is_repetitive"))
        .join(dropped, "doc_id", "left")
        .join(contaminated, "doc_id", "left")).localCheckpoint())
    conds = _hygiene_conds(0.72)
    hygiene = _stage_counts(flags, conds)
    t("hygiene_counts+mat", lambda: _noop(hygiene))
    survivor_ids = flags.where(conds[4]).select("doc_id")
    from nlp_with_pyspark_spark.operators.selection import features_expr
    survivors = t("survivors_ckpt", lambda: corpus.join(survivor_ids, "doc_id", "left_semi")
                  .select("doc_id", features_expr("tokens").alias("__feats")).localCheckpoint())
    scored = t("dsir_score_ckpt", lambda: dsir_scores(
        survivors, target.select(features_expr("tokens").alias("__feats")),
        features_col="__feats").localCheckpoint())
    qrows = t("quantile", lambda: exact_quantiles(scored, "dsir_score", [0.5]).collect())
    kept = scored.where(F.col("dsir_score") >= float(qrows[0]["value"]))
    idx, name = FULL_FUNNEL_STAGES[-1]
    sel = kept.agg(F.count(F.lit(1)).alias("n_docs")).select(
        F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "n_docs")
    t("sel_count+mat", lambda: _noop(sel))


def dsir_topk(spark, t):
    from pyspark.sql import functions as F

    from nlp_with_pyspark_spark.operators.selection import (
        dsir_resample_top_k,
        dsir_scores,
        dsir_weights,
    )
    from nlp_with_pyspark_spark.queries import _tokenized_documents

    docs = t("tokenize_ckpt", lambda: _tokenized_documents(spark, SF_DIR)
             .select("doc_id", "lang", "tokens").localCheckpoint())
    target = docs.where(F.col("lang") == "en")
    w = t("weights_collect", lambda: dsir_weights(docs, target).collect())
    # scoring + gumbel + takeordered, weights pre-collected: rebuild via dsir_scores(weights=)
    wdf = spark.createDataFrame(w, "bucket int, w double")
    t("score+topk+mat", lambda: _noop(
        dsir_resample_top_k(docs, target, k=100, seed="dsir-r10")))


def quantiles(spark, t):
    from nlp_with_pyspark_spark.operators.sketch import exact_quantiles
    from nlp_with_pyspark_spark.sources.io import read_table

    docs = read_table(spark, SF_DIR, "documents")
    t("full+mat", lambda: _noop(exact_quantiles(
        docs, "n_chars", [0.25, 0.5, 0.9, 0.99], by=["lang"], n_buckets=256)))


LEGS = {"curation": curation, "full": full, "dsir_topk": dsir_topk, "quantiles": quantiles}


def main():
    leg = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fn = LEGS[leg]
    from nlp_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name=f"funnel-probe-{leg}")
    spark.sparkContext.setLogLevel("ERROR")
    warm = T()
    fn(spark, warm)
    fn(spark, warm)
    t = T()
    totals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, t)
        totals.append(round(time.perf_counter() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in t.stages.items()}
    print(json.dumps({
        "leg": leg,
        "stage_med": med,
        "stage_sum": round(sum(med.values()), 3),
        "totals": totals,
        "spreads": t.stages,
    }, indent=1))


if __name__ == "__main__":
    main()
