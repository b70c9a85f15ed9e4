"""nlp_with_pyspark_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of maryamxasghari/NLP-with-PySpark (reference, read-only at
/root/reference), extended with the operators a large-scale (100 TB)
training-data pipeline needs: deduplication, similarity search, text
analysis, multimodal column plumbing, and streaming windows.

Design stance (SURVEY.md §7.1):
  * DataFrame/Catalyst everywhere the reference used RDD lambdas.
  * Python confined to driver orchestration + Arrow ``pandas_udf`` for
    NLTK-ish text ops and gradient math.
  * Feature vectors as ``array<double>`` so DuckDB oracles can check them.
  * All randomness seeded; all top-ks totally ordered.

Package layout:
  * ``session``   — SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
  * ``sources``   — readers (csv/parquet) and single-file sinks
  * ``functions`` — scalar/array text + vector functions (JVM-side first)
  * ``operators`` — relational/analytic operators: vocab, tfidf, metrics,
                    dedup, similarity, textstats, windows
  * ``ml``        — MLlib pipeline wrappers + hand-rolled distributed GD/NN
  * ``streaming`` — Structured Streaming equivalents of the batch windows
  * ``plans``     — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
