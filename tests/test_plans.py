"""Physical-plan probes: the shapes that decide 100 TB behavior.

Correctness tests prove the answer is right at sf0.001; these prove the
*plan* is right — filters reach the parquet scan, projections prune the
read schema, dimension joins broadcast, aggregations keep map-side
partials. A plan regression here is a 100× slowdown at scale that no
row-count test would catch.
"""

import pyspark.sql.functions as F
import pytest

from nlp_with_pyspark_spark.operators import relational
from nlp_with_pyspark_spark.sources.io import read_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return {
        n: read_table(spark, sf_dir, n)
        for n in ["lineitem", "orders", "customer", "nation", "region", "part"]
    }


def test_filter_pushed_to_parquet_scan(tables):
    q = relational.pricing_summary(tables["lineitem"])
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan, plan


def test_scan_schema_pruned_to_used_columns(tables):
    q = relational.pricing_summary(tables["lineitem"])
    plan = plan_of(q)
    # lineitem is 16 columns wide; the Q1 shape needs exactly 7 —
    # check the FileScan output column list (ReadSchema is truncated
    # in the plan string)
    scan_cols = plan.split("FileScan parquet [")[1].split("]")[0]
    cols = {c.split("#")[0] for c in scan_cols.split(",")}
    assert cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, cols


def test_dim_joins_broadcast_not_shuffle(tables):
    q = relational.customer_nation_revenue(
        tables["customer"], tables["orders"], tables["nation"], tables["region"]
    )
    plan = plan_of(q)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, "dim join degraded to a fact shuffle"


def test_agg_has_mapside_partial(tables):
    q = relational.pricing_summary(tables["lineitem"])
    plan = plan_of(q)
    # partial_* functions before the exchange = map-side combine
    assert "partial_" in plan, plan


def test_topk_compiles_to_take_ordered(tables):
    q = relational.top_parts_by_revenue(tables["lineitem"], tables["part"], k=20)
    plan = plan_of(q)
    assert "TakeOrderedAndProject" in plan, plan


def test_semi_join_stays_semi(tables):
    q = relational.order_priority_counts(tables["orders"], tables["lineitem"])
    plan = plan_of(q)
    assert "LeftSemi" in plan, plan


def test_wholestage_codegen_covers_agg(tables, spark):
    q = relational.pricing_summary(tables["lineitem"])
    q.collect()  # AQE finalizes the plan only on execution
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = q._jdf.queryExecution().explainString(mode)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark whole-stage-codegen spans: both the partial
    # and final HashAggregate must be inside one
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan, plan


def test_tfidf_vocab_join_is_broadcast(spark, sf_dir):
    from nlp_with_pyspark_spark.functions.text import tokens_pipeline
    from nlp_with_pyspark_spark.operators.features import tf_idf
    from nlp_with_pyspark_spark.operators.vocab import top_k_vocabulary

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "tokens", tokens_pipeline(F.col("text"))
    )
    vocab = top_k_vocabulary(docs, k=100)
    plan = plan_of(tf_idf(docs, vocab))
    assert "BroadcastHashJoin" in plan, "vocab join must broadcast, not shuffle the corpus"
