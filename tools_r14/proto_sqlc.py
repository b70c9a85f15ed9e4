#!/usr/bin/env python
"""Prototype: SQL-compile the text-gate expressions (VERDICT r13 item 2).

Questions this answers before any engine edit:
  1. does Column._jc.expr().sql() of the py4j-built gate expressions
     round-trip through F.expr() (lambdas, flet, regexes)?
  2. are the reparsed expressions' results IDENTICAL on real data?
  3. how much fresh-plan driver time does the reparse save?
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

SENT = "__sqlc_input__"


def time_build(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"build {label}: {[round(t, 3) for t in ts]}")


for name, builder in [
    ("is_repetitive_expr", lambda c: is_repetitive_expr(c)),
    ("quality_score_expr", lambda c: quality_score_expr(c)),
    ("tokens_pipeline", lambda c: tokens_pipeline(c)),
]:
    time_build(f"{name} (py4j)", lambda: builder(F.col("text")))
    col = builder(F.col(SENT))
    t0 = time.perf_counter()
    sql = col._jc.expr().sql()
    print(f"extract {name}: {time.perf_counter()-t0:.3f}s, {len(sql)} chars")
    assert SENT in sql, sql[:500]
    tmpl = sql.replace(f"`{SENT}`", "{0}").replace(SENT, "{0}")
    reparse = lambda: F.expr(tmpl.format("`text`"))  # noqa: E731
    time_build(f"{name} (reparsed)", reparse)
    # equality on real data, both SFs
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        a = docs.select("doc_id", builder(F.col("text")).alias("v")).collect()
        b = docs.select("doc_id", reparse().alias("v")).collect()
        same = sorted(map(tuple, a)) == sorted(map(tuple, b))
        print(f"  equality {name} @ {sf}: {same} ({len(a)} rows)")
        if not same:
            bad = [
                (x, y)
                for x, y in zip(sorted(map(tuple, a)), sorted(map(tuple, b)))
                if x != y
            ][:3]
            print("   first diffs:", bad)
    with open(f"/root/repo/tools_r14/sqlc_{name}.sql", "w") as fh:
        fh.write(tmpl)
print("DONE")
