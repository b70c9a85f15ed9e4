"""Deterministic hash-threshold sampling — reproducible corpus slices.

``df.sample()`` draws from a per-partition RNG: re-running the job, or
changing the partition count, changes the sample. A 100 TB training-data
pipeline needs the opposite — *membership decided by the row itself*, so
the same document lands in the same split on every run, on any cluster
layout, and samples can be grown without resampling. The standard trick:
hash a stable key to a uniform value and keep rows under a threshold.

Engine-independence (same rule as :mod:`.dedup`): the oracle-checkable
family compares the lowercase-hex ``md5`` digest *lexicographically*
against an 8-hex-digit threshold — both engines agree bit-for-bit, and
no hex→int conversion is needed. Because the digest is longer than the
threshold, ``md5(key) < thr`` holds exactly when the digest's first
8 digits are below it, so the keep-probability is exactly
``round(rate · 16⁸) / 16⁸`` (resolution ≈ 2.3e-10 — the quantization is
documented, not hidden). A ``hash_fn='xxhash64'`` production family
avoids the md5 cost where oracle parity isn't needed.

Properties the tests pin:
  * deterministic: same key + salt ⇒ same decision, any partitioning;
  * nested: ``sample(r1) ⊆ sample(r2)`` for ``r1 ≤ r2`` under one salt —
    thresholds grow monotonically, so a 1 % pilot extends to 10 %
    without churn;
  * independent across salts (different salt ⇒ fresh coin);
  * splits partition: every row lands in exactly one split.

All pure Catalyst projections/filters — sampling runs at scan speed and
Parquet sees the pushed filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8


def _threshold_hex(rate: float) -> str:
    """rate ∈ [0, 1] → 8-hex-digit threshold (clamped).

    rate = 1 maps to ``'g'``: every hex digit sorts below ``'g'``, so
    ``md5(...) < 'g'`` keeps all rows — an 8-digit all-f threshold would
    wrongly drop digests starting ``ffffffff``."""
    q = min(max(int(round(rate * _HEX_SPACE)), 0), _HEX_SPACE)
    return "g" if q == _HEX_SPACE else format(q, "08x")


def _uniform_hex(key: Column, salt: str) -> Column:
    """Lowercase md5 digest of ``salt~key`` — the row's uniform draw."""
    return F.md5(F.concat(F.lit(f"{salt}~"), key.cast("string")))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample",
    hash_fn: str = "md5",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hashed key falls
    under the rate threshold.

    ``hash_fn='md5'`` is the oracle family (lexicographic hex compare,
    DuckDB-identical). ``'xxhash64'`` keeps membership via
    ``pmod(xxhash64(salt, key), 2³²)/2³²`` — cheaper at scale, same
    determinism/nesting properties, no SQL oracle.
    """
    if rate >= 1.0:
        return df
    if rate <= 0.0:
        return df.where(F.lit(False))
    if hash_fn == "xxhash64":
        q = int(round(rate * (1 << 32)))
        u = F.pmod(F.xxhash64(F.lit(salt), F.col(key_col)), F.lit(1 << 32))
        return df.where(u < F.lit(q))
    if hash_fn != "md5":
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    return df.where(_uniform_hex(F.col(key_col), salt) < F.lit(_threshold_hex(rate)))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample dominant
    languages while keeping the tail intact (the standard corpus
    rebalancing move). ``rates`` maps stratum value → keep rate; strata
    not listed get ``default_rate``.

    One scan, one filter, no shuffle: the per-row threshold is a CASE
    over the stratum column compared against the row's hash draw.
    """
    thr: Column = F.lit(_threshold_hex(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold_hex(rate))).otherwise(thr)
    return df.where(_uniform_hex(F.col(key_col), salt) < thr)


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic disjoint splits (train/valid/test) as a ``split``
    label column: the hash draw is binned by cumulative thresholds, so
    every row gets exactly one label and the assignment is stable under
    any re-run or repartition — the scale-safe ``randomSplit``.

    Fractions must sum to 1 (±1e-9); thresholds are quantized to 16⁻⁸
    like :func:`hash_sample`, with the last bin absorbing the remainder
    so no row is ever unlabelled.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = _uniform_hex(F.col(key_col), salt)
    names = list(fractions)
    cum = 0.0
    bounds = []  # (name, cumulative threshold), increasing
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, _threshold_hex(cum)))
    # chain lowest-threshold-first; the last bin absorbs the remainder
    expr: Column = F.lit(names[-1])
    for name, b in reversed(bounds):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def group_safe_split(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str | Column,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe splits: every row sharing ``group_col`` lands in the
    SAME split. Adds ``rep`` (the group's representative = min ``id_col``)
    and ``split`` (the :func:`hash_split` draw taken on ``rep``, not the
    row's own id).

    Why it exists: a plain per-row :func:`hash_split` scatters exact
    duplicates (or near-dup cluster members, or same-URL revisions)
    across train and test, and the test set silently measures
    memorization — the classic eval-leakage bug. Grouping by a content
    key (``md5(text)`` for exact dups, a connected-component id for
    near-dups, a URL host for provenance) pins the whole group to one
    side. Published pipelines do exactly this before benchmark decontam
    (test-set leakage via duplicates is the failure both guard against).

    Scale shape: one shuffle, on the group key, carrying only the
    columns the caller kept (project to ``(id, group)`` first — the
    window needs nothing else, and the split label joins back by id if
    the text is needed downstream). The representative comes from a
    window ``min`` rather than a groupBy+join, so the plan is a single
    Exchange with no corpus-sized build side. The draw reuses
    ``hash_split``'s md5 thresholds, so group membership is the ONLY
    behavioral difference — fractions, quantization, and determinism
    properties carry over verbatim, and a group-of-one row gets exactly
    the split ``hash_split`` would have given it.
    """
    from pyspark.sql import Window

    taken = {"rep", "split"} & set(df.columns)
    if taken:
        # withColumn silently REPLACES on name collision — refuse rather
        # than overwrite caller data (the __-prefix convention guards the
        # internal columns elsewhere; these two are deliberate outputs)
        raise ValueError(
            f"group_safe_split writes output columns {sorted(taken)} that "
            "already exist in the input — rename or drop them first"
        )
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    rep = F.min(id_col).over(Window.partitionBy(g))
    return hash_split(
        df.withColumn("rep", rep), fractions, key_col="rep", salt=salt
    )


def domain_mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    tokens_col: str = "tokens",
    weight_cap: float = 5.0,
) -> DataFrame:
    """Per-domain token shares and uniform-target resampling weights:
    (group, n_docs, n_tokens, token_share, mixture_weight).

    The sampling ops above answer "keep this row or not"; mixture
    reweighting answers "at what RATE should each domain be sampled so
    the training mixture hits a target" — the knob every published
    pretraining recipe tunes (The Pile's per-set epochs, the
    DoReMi-style domain weights). Target here is the uniform mixture;
    ``mixture_weight`` is the multiplicative factor, capped at
    ``weight_cap`` so a tiny domain is never upsampled into dominance
    (repeating a small domain 100× degrades quality faster than the
    mixture gain — cap and let curation fix the gap).

    ``mixture_weight`` feeds straight into :func:`stratified_hash_sample`
    (rates = weight · base_rate) — compute once, sample deterministically.

    Scale shape: one map-side-combined hash agg over (group) — counts
    and token sums only, no text moves — followed by a window over the
    ≤|domains| aggregated rows (the single-partition window is on the
    TINY post-agg side, never the corpus). Shares divide exact BIGINT
    sums, so both engines agree bit-for-bit before rounding.
    """
    from pyspark.sql import Window

    per = docs.groupBy(F.col(group_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col)).alias("n_tokens"),
    )
    w = Window.partitionBy()
    share_raw = F.col("n_tokens") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return per.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(share_raw, 8).alias("token_share"),
        F.round(F.least(F.lit(weight_cap), target / share_raw), 6).alias(
            "mixture_weight"
        ),
    )


def deterministic_shuffle(
    docs: DataFrame,
    seed: str = "epoch-0",
    id_col: str = "doc_id",
    n_shards: int = 8,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Seed-reproducible global training order: every row gets a
    (shard, pos) address that is a pure function of (seed, id) — the
    scale-safe "global shuffle" a training data loader wants per epoch.
    A new ``seed`` ("epoch-1", ...) is a fresh, independent permutation.

    Why not ``orderBy(rand())``: non-reproducible across runs and
    partitionings, and a single global sort. Here the order key is
    ``md5(seed:id)`` (the same engine-independent uniform draw the
    sampling family uses), the shard is a uniform bin of the key's
    first 16 bits — ``floor(v·n/2¹⁶)``, bias ≤ n/2¹⁶ — and ``pos`` is
    the rank of the key within the shard. Reading shards in
    (shard, pos) order IS the permutation; it is pseudo-random by
    construction, so the shard-major concatenation needs no global
    sort.

    100 TB shape: ONE hash shuffle (the window's partition on shard;
    n_shards parallelism — size it like any output-file count), a sort
    within each shard, zero joins; write with
    ``io.write_partitioned(..., ["shard"])`` and a training job streams
    shard files in pos order. The md5/bin/rank chain is expressible
    verbatim in ANSI SQL, so the whole permutation is DuckDB-oracled
    (queries.corpus_shuffle_order).
    """
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    keep = [id_col, *(payload_cols or [])]
    from pyspark.sql import Window

    v = F.conv(F.substring(F.col("_sk"), 1, 4), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("_sk", id_col)
    return (
        docs.select(*keep, key.alias("_sk"))
        .withColumn(
            # exact in doubles (operands < 2^53), floor matches the
            # oracle SQL's floor() bit-for-bit
            "shard", F.floor((v * F.lit(int(n_shards))) / F.lit(65536)).cast("int")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_sk")
    )
