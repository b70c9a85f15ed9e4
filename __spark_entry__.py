"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``nlp_with_pyspark_spark.queries``): ``entry`` runs the flagship
query at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlp_with_pyspark_spark.queries import ORACLES, QUERIES  # noqa: E402

FLAGSHIP = "tfidf_long"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TF-IDF over the documents table — the heart of the reference
    (RDD_logisticregression.py:70-100), Spark-first (SURVEY §7.3).
    """
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
