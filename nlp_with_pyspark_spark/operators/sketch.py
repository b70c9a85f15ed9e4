"""Sketch-guided EXACT algorithms: distributed quantiles and heavy
hitters.

Both operators answer questions a naive plan answers with a global
sort or a full-vocabulary shuffle. Both use a small first-pass summary
(an equi-width histogram; a count-min sketch) ONLY to prune the second,
exact pass — the summary never appears in the output, so results are
exact and externally oracle-able even though the scale path routes
through an approximation internally.

* :func:`exact_quantiles` — discrete quantiles (the value at 1-indexed
  rank ``max(1, ceil(q*n))`` — DuckDB ``quantile_disc`` semantics,
  verified empirically) via histogram bucketing + in-bucket selection.
  A global ``orderBy`` at 100 TB is a full-data range-exchange sort;
  here pass 1 is one map-side-combined aggregation into ≤``n_buckets``
  rows per group, the driver locates the bucket holding each requested
  rank (a bounded collect: #groups × n_buckets small integers — same
  contract as the 1-row bounds fetch in operators/layout.py), and
  pass 2 sorts ONLY the targeted buckets (expected n/n_buckets rows
  each). Shuffle volume: O(#quantiles × n/n_buckets) instead of O(n).
  Degenerate skew (every value in one bucket, e.g. a constant column)
  falls back to sorting that one bucket — correct, and the production
  response is a second histogram level inside the hot bucket, which is
  this same function applied to the bucket's rows.

* :func:`heavy_hitters` — every token with frequency ≥ ``phi``·total,
  with EXACT counts. Pass 1 builds a count-min sketch as a grouped
  aggregation over (seed, bucket) — partial aggregation caps the
  shuffle at partitions × depth × width tiny integer rows, and the
  collected sketch is depth × width longs on the driver. Pass 2
  compiles the sketch into literal array lookups (SQL-string compiled,
  the operators/similarity.py pattern — Catalyst constant-folds the
  arrays, so each row costs ``depth`` hashes + lookups) and filters
  the token stream to sketch candidates BEFORE the exact groupBy.
  Count-min never underestimates, so candidates ⊇ true heavy hitters,
  and the exact recount + threshold filter yields exactly the true
  answer — the sketch's ε-error only admits false candidates into the
  recount, never wrong output. Shuffle volume: occurrences of
  candidate words only, not the full vocabulary (a long-tail corpus
  vocabulary is millions of words; candidates at phi=0.1% are ≤1000
  plus O(depth·width·ε) false positives).

No counterpart in the reference (its corpus fits one pandas frame —
`LogisticRegression.py:50` reads the whole CSV on the driver); these
are engine extensions for corpus-scale statistics.

References: Cormode & Muthukrishnan, "An Improved Data Stream Summary:
the Count-Min Sketch and its Applications" (J. Algorithms 55(1), 2005);
Munro & Paterson, "Selection and Sorting with Limited Storage" (TCS
1980) — the multi-pass selection idea behind histogram refinement.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: Sequence[float],
    by: Sequence[str] = (),
    n_buckets: int = 2048,
) -> DataFrame:
    """Exact discrete quantiles of ``value_col``, optionally per group.

    Returns one row per (group, quantile): ``by... , q, value`` where
    ``value`` is the element at 1-indexed rank ``max(1, ceil(q*n))`` of
    the group's sorted non-null values — exactly DuckDB's
    ``quantile_disc``. Nulls are excluded (both engines agree).

    Contract: ``by`` must have bounded cardinality (the driver collects
    one bounds row and ≤``n_buckets`` histogram rows per group — the
    per-language / per-source corpus-stats shape, not a per-user one).
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    by = list(by)
    spark = df.sparkSession
    v = F.col(value_col)
    data = df.where(v.isNotNull()).select(*by, value_col)

    bounds = data.groupBy(*by).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"), F.count(F.lit(1)).alias("__n")
    )
    bound_rows = [r for r in bounds.collect() if r["__n"] > 0]
    if not bound_rows:
        schema = ", ".join(
            [f"`{c}` {t}" for c, t in data.select(*by).dtypes]
            + ["q double", f"value {dict(data.dtypes)[value_col]}"]
        )
        return spark.createDataFrame([], schema)

    # bucket id as ONE shared expression: both passes must bucket
    # identically, including float rounding at bucket edges, so the
    # expression is built once and reused verbatim
    bounds_small = F.broadcast(
        spark.createDataFrame(bound_rows, schema=bounds.schema)
    )
    width = (F.col("__hi").cast("double") - F.col("__lo").cast("double")) / F.lit(
        float(n_buckets)
    )
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v.cast("double") - F.col("__lo").cast("double")) / width),
            F.lit(n_buckets - 1),
        )
    ).cast("int")
    bucketed = data.join(bounds_small, by) if by else data.crossJoin(bounds_small)
    bucketed = bucketed.withColumn("__bucket", bucket)

    hist = (
        bucketed.groupBy(*by, "__bucket")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    counts: dict[tuple, dict[int, int]] = {}
    for r in hist:
        counts.setdefault(tuple(r[c] for c in by), {})[r["__bucket"]] = r["__c"]

    # driver: walk each group's cumulative histogram to the bucket
    # holding each requested rank; emit (group, bucket, local_rank, q)
    targets = []
    for br in bound_rows:
        key = tuple(br[c] for c in by)
        n = br["__n"]
        hist_g = sorted(counts.get(key, {}).items())
        for q in quantiles:
            rank = max(1, math.ceil(q * n))
            cum = 0
            for b, c in hist_g:
                if cum + c >= rank:
                    targets.append((*key, b, rank - cum, float(q)))
                    break
                cum += c
    tdf = F.broadcast(
        spark.createDataFrame(
            targets,
            schema=", ".join(
                [f"`{c}` {t}" for c, t in data.select(*by).dtypes]
                + ["__bucket int", "__k long", "q double"]
            ),
        )
    )

    # pass 2: keep only targeted buckets (broadcast semi prefilter),
    # sort within each — expected n/n_buckets rows per bucket
    needed = bucketed.join(
        tdf.select(*by, "__bucket").distinct(), [*by, "__bucket"], "left_semi"
    )
    rn = F.row_number().over(
        Window.partitionBy(*by, "__bucket").orderBy(v.asc())
    )
    ranked = needed.withColumn("__rn", rn)
    return (
        ranked.join(tdf, [*by, "__bucket"])
        .where(F.col("__rn") == F.col("__k"))
        .select(*by, "q", v.alias("value"))
        .orderBy(*by, "q")
    )


def _cm_bucket_sql(seed: int, word_sql: str, width: int) -> str:
    """0-based count-min bucket of ``word_sql`` under hash row ``seed``
    — ONE SQL string used verbatim by both the sketch-build pass and
    the literal-lookup filter, so the two passes cannot disagree on a
    hash. xxhash64 is the production family (native 64-bit, no string
    materialization); seeding by a leading int literal follows
    operators/dedup.minhash_signature."""
    return f"cast(pmod(xxhash64({seed}, {word_sql}), {width}) as int)"


def heavy_hitters(
    docs: DataFrame,
    tokens_col: str = "tokens",
    phi: float = 0.001,
    depth: int = 3,
    width: int = 4096,
) -> DataFrame:
    """All tokens whose exact frequency ≥ ``ceil(phi * total_tokens)``,
    with their EXACT counts: ``(word, count)`` ordered by count desc,
    word asc.

    Two passes over the exploded token stream (module docstring has the
    scale argument): a count-min sketch build whose shuffle is bounded
    by depth × width regardless of vocabulary size, then an exact
    recount restricted to sketch candidates. The threshold is derived
    from the sketch's own row-0 sum (= total token count), so the
    stream is scanned exactly twice.
    """
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi={phi} outside (0, 1]")
    words = docs.select(F.explode(F.col(tokens_col)).alias("word"))

    entries = words.select(
        F.posexplode(
            F.array(
                *[F.expr(_cm_bucket_sql(i, "word", width)) for i in range(depth)]
            )
        ).alias("seed", "bucket")
    )
    sketch = [[0] * width for _ in range(depth)]
    for r in entries.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    ).collect():
        sketch[r["seed"]][r["bucket"]] = r["c"]
    total = sum(sketch[0])
    if total == 0:
        return words.groupBy("word").agg(F.count(F.lit(1)).alias("count")).limit(0)
    threshold = max(1, math.ceil(phi * total))

    # literal-compiled candidate filter: least over depth rows of
    # sketch[seed][bucket(word)] — constant-folded arrays, no py4j tree
    lookups = ", ".join(
        f"element_at(array({','.join(str(c) for c in sketch[i])}),"
        f" {_cm_bucket_sql(i, 'word', width)} + 1)"
        for i in range(depth)
    )
    est = F.expr(f"least({lookups})" if depth > 1 else lookups)
    return (
        words.where(est >= F.lit(threshold))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= threshold)
        .orderBy(F.desc("count"), F.asc("word"))
    )
