#!/usr/bin/env python
"""Prototype: per-process memo of the gate-expression Column trees
(VERDICT r13 item 2). Answers, before any engine edit:

  1. is reusing ONE Column object across many DataFrame plans safe
     (lambdas, flet) — including twice in one plan?
  2. results identical to freshly-built expressions on real data?
  3. how much fresh-plan driver time does the reuse save?
"""

from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from nlp_with_pyspark_spark.session import get_spark  # noqa: E402
from nlp_with_pyspark_spark.operators.textstats import (  # noqa: E402
    is_repetitive_expr,
    quality_score_expr,
)
from nlp_with_pyspark_spark.functions.text import tokens_pipeline  # noqa: E402

spark = get_spark(shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")


def time_build(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"build {label}: {[round(t, 3) for t in ts]}")


docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

for name, builder in [
    ("is_repetitive_expr", lambda: is_repetitive_expr(F.col("text"))),
    ("quality_score_expr", lambda: quality_score_expr(F.col("text"))),
    ("tokens_pipeline", lambda: tokens_pipeline(F.col("text"))),
]:
    time_build(f"{name} (fresh)", builder)
    cached = builder()

    # 1. reuse across plans: same Column in two separate queries
    a = docs01.select("doc_id", cached.alias("v")).collect()
    b = docs01.select("doc_id", cached.alias("v")).collect()
    fresh_res = docs01.select("doc_id", builder().alias("v")).collect()
    same = sorted(map(tuple, a)) == sorted(map(tuple, fresh_res)) and a == b
    print(f"  reuse-across-plans identical: {same} ({len(a)} rows)")

    # 2. reuse twice within ONE plan (sibling subtrees)
    twice = docs01.select(
        "doc_id", cached.alias("v1"), cached.alias("v2")
    ).collect()
    ok2 = all(r.v1 == r.v2 for r in twice) and sorted(
        (r.doc_id, r.v1) for r in twice
    ) == sorted((r.doc_id, r.v) for r in fresh_res)
    print(f"  reuse-twice-in-one-plan identical: {ok2}")

    # 3. plan-build cost with the cached column (select only, no exec)
    def build_plan():
        docs01.select("doc_id", cached.alias("v"))._jdf.queryExecution()

    time_build(f"{name} (cached col, plan build)", build_plan)
print("DONE")
