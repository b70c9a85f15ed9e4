#!/usr/bin/env python
"""Dump the funnel FLAGS-stage plan (pipeline._hygiene_flags) — the
projection that runs inside full_curation_funnel's checkpoint job and
is invisible in the final query dump.

Usage: dump_flags_plan.py <repo_root> <out_path>
"""
from __future__ import annotations

import os
import sys

root, out_path = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)

from pyspark.sql import functions as F  # noqa: E402

from nlp_with_pyspark_spark.operators.pipeline import _hygiene_flags  # noqa: E402
from nlp_with_pyspark_spark.queries import _tokenized_documents  # noqa: E402
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402
from nlp_with_pyspark_spark.sources.io import read_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
docs = _tokenized_documents(spark, SF)
bench = docs.where(F.col("doc_id") % 10 == 0)
corpus = docs.where(F.col("doc_id") % 10 != 0)
flags = _hygiene_flags(corpus, bench, 0.2, 0.5, "tokens", "text")
p = flags._sc._jvm.PythonSQLUtils.explainString(
    flags._jdf.queryExecution(), "formatted"
)
with open(out_path, "w") as fh:
    fh.write(p)
print(f"{out_path}: {p.count('Exchange')} Exchange, "
      f"{p.count('split(')} split(, {len(p)} chars")
