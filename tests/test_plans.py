"""Physical-plan probes: the shapes that decide 100 TB behavior.

Correctness tests prove the answer is right at sf0.001; these prove the
*plan* is right — filters reach the parquet scan, projections prune the
read schema, dimension joins broadcast, aggregations keep map-side
partials. A plan regression here is a 100× slowdown at scale that no
row-count test would catch. Probes use nlp_with_pyspark_spark.plans.
"""

import pyspark.sql.functions as F
import pytest

from nlp_with_pyspark_spark.operators import relational
from nlp_with_pyspark_spark.plans import (
    assert_no_shuffle_joins,
    count_occurrences,
    final_plan_string,
    pushed_filters,
    scan_columns,
)
from nlp_with_pyspark_spark.sources.io import read_table


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return {
        n: read_table(spark, sf_dir, n)
        for n in ["lineitem", "orders", "customer", "nation", "region", "part"]
    }


def test_filter_pushed_to_parquet_scan(tables):
    q = relational.pricing_summary(tables["lineitem"])
    pf = pushed_filters(q)
    assert "IsNotNull(l_shipdate)" in pf and "LessThan(l_shipdate" in pf, pf


def test_scan_schema_pruned_to_used_columns(tables):
    # lineitem is 11 columns wide; the Q1 shape needs exactly 7
    q = relational.pricing_summary(tables["lineitem"])
    assert scan_columns(q) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }


def test_dim_joins_broadcast_not_shuffle(tables):
    q = relational.customer_nation_revenue(
        tables["customer"], tables["orders"], tables["nation"], tables["region"]
    )
    assert count_occurrences(q, "BroadcastHashJoin") >= 3
    assert_no_shuffle_joins(q)


def test_agg_has_mapside_partial(tables):
    q = relational.pricing_summary(tables["lineitem"])
    assert count_occurrences(q, "partial_") > 0


def test_topk_compiles_to_take_ordered(tables):
    q = relational.top_parts_by_revenue(tables["lineitem"], tables["part"], k=20)
    assert count_occurrences(q, "TakeOrderedAndProject") == 1


def test_semi_join_stays_semi(tables):
    q = relational.order_priority_counts(tables["orders"], tables["lineitem"])
    assert count_occurrences(q, "LeftSemi") >= 1


def test_wholestage_codegen_covers_agg(tables):
    plan = final_plan_string(relational.pricing_summary(tables["lineitem"]))
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
    q = tf_idf(docs, vocab)
    assert count_occurrences(q, "BroadcastHashJoin") >= 1


def test_minhash_signature_evaluated_once(spark, sf_dir):
    """Regression guard for the 30× dedup speedup: exactly one 12-hash
    signature evaluation (12 array_min) in the candidate-pairs plan."""
    from nlp_with_pyspark_spark.functions.text import tokens_pipeline
    from nlp_with_pyspark_spark.operators.dedup import minhash_candidate_pairs

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "tokens", tokens_pipeline(F.col("text"))
    )
    q = minhash_candidate_pairs(docs)
    assert count_occurrences(q, "array_min") == 12


def test_multimodal_stats_prunes_payload(spark, sf_dir):
    """Metadata-only asset query must not read the text/payload column."""
    from nlp_with_pyspark_spark.operators.multimodal import asset_stats, synthetic_assets

    # other modules may have cached an identical asset plan; a cache hit
    # substitutes an InMemoryRelation whose backing scan read all columns,
    # which is not what this probe measures
    spark.catalog.clearCache()
    assets = synthetic_assets(read_table(spark, sf_dir, "documents"))
    # modality-only rollup: drop the byte aggregates so only doc_id feeds it
    q = assets.groupBy("modality").count()
    assert "text" not in scan_columns(q)


def test_q5_shape_broadcasts_and_pushdown(tables, spark, sf_dir):
    supp = read_table(spark, sf_dir, "supplier")
    q = relational.local_supplier_volume(
        tables["lineitem"], tables["orders"], tables["customer"],
        supp, tables["nation"], tables["region"],
    )
    # date range reaches the orders parquet scan
    pf = pushed_filters(q)
    assert "GreaterThanOrEqual(o_orderdate" in pf and "LessThan(o_orderdate" in pf, pf
    # supplier/nation/region all broadcast (region semi-join reduction)
    assert count_occurrences(q, "BroadcastHashJoin") >= 2


def test_anti_join_stays_anti(tables):
    q = relational.dormant_customers(tables["customer"], tables["orders"])
    assert count_occurrences(q, "LeftAnti") >= 1
    pf = pushed_filters(q)
    assert "GreaterThanOrEqual(o_orderdate" in pf, pf


def test_pure_projection_ops_have_zero_exchanges(spark, sf_dir):
    """The scan-speed corpus-hygiene operators (PII scrub, quantization,
    repetition, quality) must stay single-stage: zero Exchange nodes,
    pruned read schema. An accidental shuffle here is the difference
    between scan speed and a corpus-wide repartition at 100 TB."""
    from nlp_with_pyspark_spark.functions.vector import dequantize_error, quantize_int8
    from nlp_with_pyspark_spark.operators.textstats import (
        pii_scrub,
        quality_features,
        repetition_features,
    )

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    qz = quantize_int8(F.col("embedding"))
    cases = {
        "pii_scrub": pii_scrub(docs),
        "repetition": repetition_features(docs),
        "quality": quality_features(docs),
        "quantization": emb.select("vec_id", qz.alias("qz")),
    }
    for name, df in cases.items():
        plan = final_plan_string(df)
        assert "Exchange" not in plan, f"{name} plan shuffles:\n{plan}"


def test_decontamination_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark inverted index must ride a broadcast: the corpus
    side of the decontamination join may never shuffle its shingles."""
    from nlp_with_pyspark_spark.operators.decontam import benchmark_overlap
    from nlp_with_pyspark_spark.queries import _tokenized_documents

    docs = _tokenized_documents(spark, sf_dir)
    q = benchmark_overlap(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
    )
    plan = final_plan_string(q)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_ivf_fixed_centroid_assignment_is_projection(spark, sf_dir):
    """fixed_centroid_ivf_topk compiles the quantizer into literals:
    corpus-side list assignment must be a projection (no join, no
    shuffle below the final bucket join + rank window)."""
    from nlp_with_pyspark_spark.operators.similarity import fixed_centroid_ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.where(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    ]
    q = fixed_centroid_ivf_topk(emb, emb.where(F.col("vec_id") < 2), cents, k=5, n_probe=2)
    plan = final_plan_string(q)
    # the probe join broadcasts (AQE explain may render the node in both
    # the final and cached trees — assert presence, and that no join
    # shuffles); the only exchange is the rank window's partitionBy
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_pq_encode_is_pure_projection(spark, sf_dir):
    """pq_encode compiles its codebooks to literals: the corpus-wide
    re-encode must be scan → project → explode with ZERO exchanges —
    at 100 TB the difference between scan speed and a corpus shuffle."""
    from nlp_with_pyspark_spark.operators.similarity import (
        pq_encode,
        pq_fixed_codebooks,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    plan = final_plan_string(pq_encode(emb, pq_fixed_codebooks()))
    assert "Exchange" not in plan, plan


def test_dup_ngram_coverage_has_no_unkeyed_join(spark, sf_dir):
    """Substring dedup must stay shuffle-bounded by its keys: hash-agg
    on the gram key, key join-back, doc_id window — never a cartesian
    or nested-loop pairing of the corpus with itself."""
    from nlp_with_pyspark_spark.operators.dedup import duplicated_ngram_coverage
    from nlp_with_pyspark_spark.queries import _tokenized_documents

    docs = _tokenized_documents(spark, sf_dir)
    plan = final_plan_string(duplicated_ngram_coverage(docs, n=5, min_df=2))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
