#!/usr/bin/env python
"""Dump .explain('formatted') for the given queries at sf0.1.

Usage: dump_plans.py <repo_root> <out_dir> <suffix> <query> [query...]
"""
from __future__ import annotations

import os
import sys

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)

from nlp_with_pyspark_spark.queries import QUERIES  # noqa: E402
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)
for name in names:
    df = QUERIES[name](spark, SF)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(p)
    print(f"{name}_{suffix}: {p.count('Exchange')} Exchange, {len(p)} chars")
