"""End-to-end training-data pipeline composition.

The individual corpus-hygiene operators (quality scoring, repetition
filters, near-dup dedup, decontamination) are each oracle-checked on
their own; this module composes them into the funnel a real ingestion
pipeline runs, with the yield report every data team watches: how many
documents survive each stage.

Composition is where a declarative engine pays off: each stage is a
DataFrame transformation, so Catalyst sees the WHOLE pipeline as one
plan — the quality/repetition projections fuse into the scan, the drop
lists stay on the join side, and nothing materializes between stages
unless an operator itself demands a barrier (the minhash checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import benchmark_overlap
from .dedup import _shingle_sets, minhash_dedup_pairs
from .graph import connected_components
from .textstats import is_repetitive_expr, quality_score_expr

#: (index, name) of the funnel stages, in order
FUNNEL_STAGES = (
    (0, "raw"),
    (1, "quality"),
    (2, "non_repetitive"),
    (3, "deduped"),
    (4, "decontaminated"),
)


def corpus_funnel(
    corpus: DataFrame,
    benchmark: DataFrame,
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.2,
    contamination_max: float = 0.5,
    tokens_col: str = "tokens",
) -> DataFrame:
    """(stage_idx, stage, n_docs): documents surviving each cumulative
    pipeline stage — quality filter, then repetition filter, then
    keep-first near-dup dedup, then benchmark decontamination.

    Both inputs carry text + ``tokens_col``. Thresholds compare against
    the ROUNDED scores the stage operators emit, so the funnel is
    bit-reproducible against the DuckDB oracle (float-boundary docs land
    the same way in both engines).

    Scale shape: ONE full-corpus projection computes both per-row gates
    (quality score + repetition flag — the expression-level
    ``quality_score_expr`` / ``is_repetitive_expr`` twins of the checked
    stage operators, so no self-join of two corpus scans), ONE corpus
    shingle materialization feeds both the minhash pair pipeline and the
    decontamination corpus side (each used to re-derive shingles from
    text independently — the combined change measured 1.3× at sf0.1:
    7.9 s → 6.0 s warm median-of-2), and the two
    id-only drop lists join back LEFT (AQE broadcasts them at realistic
    duplicate/contamination rates). The corpus body itself is never
    shuffled by the funnel; the stage explode emits ≤ 5 rows per doc of
    (int, bool) pairs into one final hash agg.
    """
    shingles = _shingle_sets(corpus, tokens_col, "doc_id").localCheckpoint()
    # pairs checkpointed: connected_components re-reads its input for
    # the canonicalize step AND the funnel wants the pair job's cost
    # paid once; the drop list then needs only the raw component
    # assignment (connected_components), not duplicate_clusters'
    # n_members window — one less shuffle on a column the funnel never
    # reads
    pairs = minhash_dedup_pairs(
        corpus,
        tokens_col=tokens_col,
        threshold=jaccard_threshold,
        shingles=shingles,
    ).localCheckpoint()
    dropped = (
        connected_components(pairs, src="doc_a", dst="doc_b")
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"), F.lit(1).alias("is_dropped"))
    )
    contaminated = (
        benchmark_overlap(
            corpus, benchmark, threshold=contamination_max, corpus_shingles=shingles
        )
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(1))
    )
    flags = (
        corpus.select(
            "doc_id",
            quality_score_expr(F.col("text")).alias("quality_score"),
            is_repetitive_expr(F.col("text")).alias("is_repetitive"),
        )
        .join(dropped, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
    )
    c1 = F.col("quality_score") >= quality_min
    c2 = c1 & (F.col("is_repetitive") == 0)
    c3 = c2 & F.col("is_dropped").isNull()
    c4 = c3 & F.col("is_contaminated").isNull()
    conds = {0: F.lit(True), 1: c1, 2: c2, 3: c3, 4: c4}
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                conds[i].alias("ok"),
            )
            for i, name in FUNNEL_STAGES
        ]
    )
    return (
        flags.select(F.explode(stages).alias("s"))
        .where(F.col("s.ok"))
        .groupBy(
            F.col("s.stage_idx").alias("stage_idx"), F.col("s.stage").alias("stage")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
