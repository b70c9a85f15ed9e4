#!/usr/bin/env python
"""Measure collocations_pmi_top50 (VERDICT r13 item 5): plan shape,
fresh-vs-reused-plan cost, and where the 5.8 s goes."""

from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")

from nlp_with_pyspark_spark.queries import QUERIES  # noqa: E402
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

fn = QUERIES["collocations_pmi_top50"]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# warm twice (bench protocol)
noop(fn(spark, SF))
noop(fn(spark, SF))

# fresh plan per call (what the bench times)
for i in range(3):
    t0 = time.perf_counter()
    noop(fn(spark, SF))
    print(f"fresh-plan mat {i}: {time.perf_counter()-t0:.2f}s")

# same DataFrame re-materialized (execution-only cost)
df = fn(spark, SF)
noop(df)
for i in range(3):
    t0 = time.perf_counter()
    noop(df)
    print(f"reused-plan mat {i}: {time.perf_counter()-t0:.2f}s")

# plan-build cost alone
t0 = time.perf_counter()
df2 = fn(spark, SF)
print(f"column/DF build: {time.perf_counter()-t0:.2f}s")

with open("/root/repo/tools_r14/colloc_plan.txt", "w") as fh:
    fh.write(df2._sc._jvm.PythonSQLUtils.explainString(
        df2._jdf.queryExecution(), "formatted"))
print("plan written; Exchange count:",
      open("/root/repo/tools_r14/colloc_plan.txt").read().count("Exchange"))
