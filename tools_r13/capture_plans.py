#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r13/.

Usage: python tools_r13/capture_plans.py <suffix> <name> [<name> ...]
  suffix: 'before' or 'after'

Each query runs in THIS process (one shared session — plan capture,
not timing). Lifecycle queries execute their build/maintain stages as
a side effect of constructing the returned DataFrame; that is the
cost of capturing their serve plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from nlp_with_pyspark_spark.queries import QUERIES
    from nlp_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
