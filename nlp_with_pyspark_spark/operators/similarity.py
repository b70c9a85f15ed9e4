"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

  * ``brute_force_topk`` — exact cosine top-k per query. The baseline
    and the recall oracle. Broadcast the (small) query set against the
    corpus: one pass, no corpus shuffle, per-partition heap via the
    ranking window.
  * ``lsh_topk`` — random-hyperplane LSH: bucket by sign-bit signature,
    search only the query's bucket (multi-probe = also adjacent buckets
    differing in 1 bit). Subquadratic; recall < 1 by design — verified
    against the brute-force oracle in tests, not by the SQL oracle.

Determinism: hyperplanes are derived from md5 digests (seeded), not an
RNG, so results are reproducible across runs, engines, and cluster
sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Self-matches excluded. Cosine rounded to 6dp before ranking, with
    neighbor_id as tie-break, so ordering is total and engine-stable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int, seed: str = "ann-seed") -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5.

    Component j ∈ [-7.5, +7.5]: hex nibble of md5(seed~plane~block) - 7.5.
    Quality is adequate for sign-LSH (only the sign of the dot matters).
    """
    import hashlib

    comps: list[float] = []
    block = 0
    while len(comps) < dim:
        h = hashlib.md5(f"{seed}~{plane_idx}~{block}".encode()).hexdigest()
        comps.extend(int(ch, 16) - 7.5 for ch in h)
        block += 1
    return comps[:dim]


def _dlit(x: float) -> str:
    """Spark SQL DOUBLE literal. The ``D`` suffix is load-bearing: a bare
    ``0.234375`` parses as DECIMAL and decimal arithmetic would silently
    replace the IEEE-double fold the DuckDB oracle mirrors."""
    return f"{float(x)!r}D"


def _arr_sql(vals: list[float]) -> str:
    return "array(" + ", ".join(_dlit(v) for v in vals) + ")"


def _dot_sql(vec_sql: str, plane: list[float]) -> str:
    """SQL text of the literal-plane dot product — semantically identical
    to the F.aggregate/F.zip_with builder it replaces, but ONE parsed
    expression instead of ~dim py4j round trips. Measured: plan BUILD
    for the literal-compiled queries (16-centroid IVF, 32-codebook PQ,
    16-plane RP/LSH) was 1.1-3.0 s of pure driver-side py4j expression
    construction per query — more than their execution at sf0.1, and a
    per-job driver stall at any scale."""
    return (
        f"aggregate(zip_with({vec_sql}, {_arr_sql(plane)}, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
    )


def _d2_sql(vec_sql: str, centroid: list[float]) -> str:
    """SQL text of squared euclidean distance to a literal centroid —
    strict left-to-right fold so the DuckDB oracle's ``list_sum`` over
    the same terms produces bit-identical doubles (see :func:`_dot_sql`
    for why this is a string)."""
    return (
        f"aggregate(zip_with({vec_sql}, {_arr_sql(centroid)}, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def centroid_entries_sql(
    vec_sql: str, centroids: list[tuple[int, list[float]]]
) -> str:
    """SQL text of the ``array(struct(d2, list_id), ...)`` literal-centroid
    distance table — the shared building block of every fixed-quantizer
    operator (IVF probe/assign, IVF-PQ, semantic dedup). One parsed
    expression instead of n_lists × dim py4j calls (see :func:`_dot_sql`
    for the measured build-time motivation)."""
    items = ", ".join(
        f"struct({_d2_sql(vec_sql, c)} AS d2, {int(lid)} AS list_id)"
        for lid, c in centroids
    )
    return f"array({items})"


def centroid_assign_col(
    vec_sql: str, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-centroid assignment as a PURE PROJECTION: per-row argmin
    over the literal (d2, list_id) structs via ``array_min``
    (lexicographic — nearest list, ties to the lowest id). Zero shuffle,
    zero join: at 100 TB the quantizer rides inside whole-stage codegen."""
    return F.expr(f"array_min({centroid_entries_sql(vec_sql, centroids)}).list_id")


def signature_col(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit signature string, one char per hyperplane. ``vec`` may be
    a Column (legacy) or a SQL fragment string (fast build path)."""
    if isinstance(vec, Column):
        bits = []
        for p in planes:
            arr = F.array(*[F.lit(float(x)) for x in p])
            d = F.aggregate(
                F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)
    parts = ", ".join(
        f"IF({_dot_sql(vec, p)} >= 0.0D, '1', '0')" for p in planes
    )
    return F.expr(f"concat({parts})")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multi_probe: bool = True,
) -> DataFrame:
    """ANN top-k: bucket corpus by sign signature, score only the
    query's bucket (+1-bit-flip probes). Same output schema as
    brute_force_topk; recall measured in tests against it.

    At 100 TB: the corpus is hash-partitioned once by signature (a
    ~n_planes-bit key ⇒ 2^n_planes buckets); each query touches
    1 + n_planes buckets instead of the full corpus.
    """
    planes = [_hyperplane(dim, i) for i in range(n_planes)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        signature_col(f"`{vec_col}`", planes).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        signature_col(f"`{vec_col}`", planes).alias("qsig"),
    )
    if multi_probe:
        # probe signatures: exact + each 1-bit flip
        def flip(sig: Column, i: int) -> Column:
            flipped = F.when(F.substring(sig, i + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            )
            return F.concat(F.substring(sig, 1, i), flipped, F.substring(sig, i + 2, n_planes - i - 1))

        probes = F.array(F.col("qsig"), *[flip(F.col("qsig"), i) for i in range(n_planes)])
        q = q.select("query_id", "qv", F.explode(probes).alias("sig"))
    else:
        q = q.select("query_id", "qv", F.col("qsig").alias("sig"))
    scored = (
        c.join(F.broadcast(q), "sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        .distinct()  # multi-probe can hit the same candidate twice
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def build_ivf_index(
    corpus: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Index-build phase of IVF ANN: k-means coarse quantizer.

    Returns (assignments, centroids): assignments = (neighbor_id, cv,
    list_id) — at 100 TB this is written ONCE partitioned/bucketed by
    list_id (`io.write_bucketed`) so queries read only their probed
    lists; centroids = n_lists rows, always broadcastable.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    with_vec = c.withColumn("fv", array_to_vector(F.col("cv").cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="fv", predictionCol="list_id", maxIter=10)
    model = km.fit(with_vec)
    assignments = model.transform(with_vec).select("neighbor_id", "cv", "list_id")
    centroids = corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "list_id int, centroid array<double>",
    )
    return assignments, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer → per-list
    inverted index → queries scan only their ``n_probe`` nearest lists.

    The scale path beyond LSH. This convenience form builds the index
    inline; production builds once with ``build_ivf_index`` (persisted
    bucketed by list_id) and serves many query batches with
    ``ivf_query`` — the build dominates single-batch latency.

    Same output schema as brute_force_topk; recall is measured against
    it in tests (tests/test_dedup_similarity.py).
    """
    assignments, centroids = build_ivf_index(corpus, n_lists, vec_col, id_col, seed)
    return ivf_query(assignments, centroids, queries, k, n_probe, vec_col, id_col)


def ivf_query(
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query phase of IVF ANN against a prebuilt index: rank centroids
    per query (broadcast — centroids are tiny), keep ``n_probe``, then
    score only the probed lists. No corpus shuffle at query time."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # rank centroids per query by euclidean distance, keep n_probe
    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("list_id"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qv", "list_id", dist2.alias("d2"))
        .withColumn("prb", F.row_number().over(wq))
        .where(F.col("prb") <= n_probe)
        .select("query_id", "qv", "list_id")
    )
    scored = (
        assignments.join(F.broadcast(probes), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def rp_project(
    embeddings: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "rp-seed",
) -> DataFrame:
    """Random-projection dimensionality reduction: out[j] = x · plane_j
    for ``out_dim`` deterministic md5-derived planes (the same
    construction sign-LSH thresholds — here the raw projections are
    kept, Johnson–Lindenstrauss style).

    The reduction matrix is compiled into the plan as literals, so the
    operator is a pure projection: 4× (64→16) smaller vectors at scan
    speed, no shuffle, no model artifact to distribute — the seed IS
    the model. Output long-form (vec_id, dim_idx, value) with values
    rounded 6dp for engine-stable comparison.
    """
    planes = [_hyperplane(dim, j, seed) for j in range(out_dim)]
    comps = ", ".join(
        f"round({_dot_sql(f'`{vec_col}`', p)}, 6)" for p in planes
    )
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.expr(f"array({comps})")).alias("dim_idx", "value"),
    )


def fixed_centroid_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN with a FIXED coarse quantizer, compiled into the plan.

    The quantizer (``centroids``: (list_id, vector) pairs — e.g. a
    deterministic sample of corpus vectors, or the persisted output of a
    k-means index build) is inlined as literal arrays, so BOTH phases
    that k-means makes iterative become single projections:

      * assignment — per-row argmin over the centroid structs via
        ``array_min`` (lexicographic (d2, list_id): nearest list, ties
        to the lowest id). Zero shuffle, scan speed: at 100 TB the
        quantizer rides inside whole-stage codegen instead of a join.
      * probing — per-query ``array_sort`` of the same structs, slice
        ``n_probe``, explode.

    The only exchanges left are the bucket join (corpus side broadcast-
    joined against the tiny probe set) and the final top-k rank window —
    identical to :func:`ivf_query`. Deterministic end-to-end, so the
    whole operator is DuckDB-oracle-able (queries.py inlines the same
    centroid literals into SQL).
    """
    vs = f"`{vec_col}`"
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        centroid_assign_col(vs, centroids).alias("list_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            F.expr(
                f"transform(slice(array_sort({centroid_entries_sql(vs, centroids)}),"
                f" 1, {n_probe}), s -> s.list_id)"
            )
        ).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def pq_fixed_codebooks(
    m: int = 8,
    ksub: int = 4,
    dsub: int = 8,
    seed: str = "pq-seed",
    scale: float = 32.0,
) -> list[list[list[float]]]:
    """Deterministic md5-derived PQ codebooks: ``[subspace][code] →
    centroid`` (the ``_hyperplane`` family, scaled into the embedding
    value range). Like the fixed-centroid IVF quantizer, the seed IS the
    model — no artifact to distribute, and the whole encode step is
    DuckDB-oracle-able because both engines inline identical literals."""
    return [
        [
            [x / scale for x in _hyperplane(dsub, s * ksub + c, seed)]
            for c in range(ksub)
        ]
        for s in range(m)
    ]


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encode: (vec_id, subspace, code, d2).

    PQ is the memory half of the IVF-PQ ANN standard (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    split each vector into ``m`` subspaces, store per subspace only the
    id of the nearest codebook centroid — 64 float32 dims become m
    single-byte codes (32× smaller), and asymmetric distance at query
    time is m table lookups instead of a 64-dim dot product. ``d2`` is
    the per-subspace squared reconstruction error (the quantization-
    quality audit, same role as embedding_quantization_stats' MSE).

    Pure projection: codebooks are compiled into the plan as literals,
    the per-subspace argmin is ``array_min`` over (d2, code) structs
    (ties → lowest code), and the only row expansion is the final
    m-rows-per-vector explode. Zero shuffle, scan speed at 100 TB —
    exactly how a cluster-wide re-encode should run. The struct array
    is ``flet``-bound so the argmin's d2 and code fields don't
    re-evaluate the fold (functions/expr.py).
    """
    from ..functions.expr import flet

    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def sub_entry(s: int) -> Column:
        sub_sql = f"slice(`{vec_col}`, {s * dsub + 1}, {dsub})"
        items = ", ".join(
            f"struct({_d2_sql(sub_sql, codebooks[s][c])} AS d2, {c} AS code)"
            for c in range(len(codebooks[s]))
        )
        return flet(
            F.expr(f"array_min(array({items}))"),
            lambda b: F.struct(
                F.lit(s).alias("subspace"),
                b["code"].alias("code"),
                F.round(b["d2"], 6).alias("d2"),
            ),
        )

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.array(*[sub_entry(s) for s in range(m)])).alias("e"),
    ).select("vec_id", "e.subspace", "e.code", "e.d2")


def pq_codes_wide(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes array<int>) — :func:`pq_encode` without the audit
    explode: the compressed corpus representation ADC search scans. Same
    pure-projection shape (codebooks inlined as literals, zero shuffle);
    at 100 TB this is the table you persist — m bytes of payload per
    vector instead of dim·4."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def code(s: int) -> Column:
        sub_sql = f"slice(`{vec_col}`, {s * dsub + 1}, {dsub})"
        items = ", ".join(
            f"struct({_d2_sql(sub_sql, codebooks[s][c])} AS d2, {c} AS code)"
            for c in range(len(codebooks[s]))
        )
        return F.expr(f"array_min(array({items})).code")

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.array(*[code(s) for s in range(m)]).alias("codes"),
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: (query_id, neighbor_id,
    adc_d2, rank) — the search half of IVF-PQ (Jégou et al. 2011).

    The query keeps full precision; each candidate contributes only its
    m codes. Per query, a lookup table ``lut[s][c] = d2(q_sub_s,
    codebook[s][c])`` is computed ONCE as a literal-compiled projection
    on the (small, broadcast) query side; the per-candidate distance is
    then ``Σ_s lut[s][code_s]`` — a zip_with/aggregate fold over m
    ints, no floating-point vector math on the corpus side at all.

    By construction ``adc_d2`` equals the true squared distance between
    the query and the candidate's RECONSTRUCTION (tests pin this
    identity), so ranking quality degrades only with quantization
    error — the audit column :func:`pq_encode` reports.

    Scale shape: broadcast queries+LUTs against the codes scan, rank
    window per query — same plan as brute_force_topk but the corpus
    side reads m bytes/row instead of dim·4 and does integer lookups
    instead of float multiplies. Compose with the IVF path (probe
    ``fixed_centroid_ivf_topk``'s lists, then ADC within probed lists)
    for the full IVF-PQ: both halves keep the corpus unshuffled.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def lut(s: int) -> Column:
        sub_sql = f"slice(`{vec_col}`, {s * dsub + 1}, {dsub})"
        items = ", ".join(
            _d2_sql(sub_sql, codebooks[s][c]) for c in range(len(codebooks[s]))
        )
        return F.expr(f"array({items})")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.array(*[lut(s) for s in range(m)]).alias("lut"),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, l: F.element_at(l, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        corpus_codes.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dist, 6).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The full IVF-PQ search (Jégou et al. 2011): coarse quantizer
    prunes WHICH vectors to score (each query touches ``n_probe`` of
    the inverted lists), product quantization compresses WHAT is
    scored (m byte codes + per-query LUT lookups instead of float
    vectors). Composition of the two literal-compiled halves:

      * corpus side — ONE projection assigns the IVF list (argmin over
        literal centroids) AND encodes the PQ codes; at 100 TB this is
        the index build, persisted bucketed by list_id with m bytes of
        payload per vector.
      * query side — ONE projection ranks centroids (array_sort, keep
        ``n_probe``) and computes the ADC lookup table.
      * search — bucket join on list_id (probe set broadcast), ADC fold
        over codes, per-query rank window. The corpus is never
        shuffled and never touched outside the probed lists.

    Equality anchor (pinned in tests): with ``n_probe = len(centroids)``
    every list is probed, so the result must EQUAL plain
    :func:`pq_adc_topk` row-for-row — the IVF half prunes candidates,
    it must never change scores.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    vs = f"`{vec_col}`"

    def code_sql(s: int) -> str:
        sub_sql = f"slice({vs}, {s * dsub + 1}, {dsub})"
        items = ", ".join(
            f"struct({_d2_sql(sub_sql, codebooks[s][c])} AS d2, {c} AS code)"
            for c in range(len(codebooks[s]))
        )
        return f"array_min(array({items})).code"

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        centroid_assign_col(vs, centroids).alias("list_id"),
        F.expr(f"array({', '.join(code_sql(s) for s in range(m))})").alias("codes"),
    )

    def lut_sql(s: int) -> str:
        sub_sql = f"slice({vs}, {s * dsub + 1}, {dsub})"
        return (
            "array("
            + ", ".join(
                _d2_sql(sub_sql, codebooks[s][c]) for c in range(len(codebooks[s]))
            )
            + ")"
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.expr(
                f"transform(slice(array_sort({centroid_entries_sql(vs, centroids)}),"
                f" 1, {n_probe}), s -> s.list_id)"
            )
        ).alias("list_id"),
        F.expr(f"array({', '.join(lut_sql(s) for s in range(m))})").alias("lut"),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda cd, l: F.element_at(l, cd + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(dist, 6).alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ shortlist → EXACT re-rank: the two-stage retrieval every
    production ANN deployment runs (Jégou et al. 2011 §V's refinement
    stage). :func:`ivfpq_topk` produces a ``shortlist``-sized candidate
    set per query from compressed codes (cheap, never touches float
    vectors outside the probed lists); the true vectors of ONLY those
    Q × shortlist candidates are then fetched and re-ranked by exact
    squared L2. This removes the ADC rank noise that dominates the
    residual recall loss among near-equidistant candidates (measured:
    trained quantizer recall@10 0.70 plain → ~1.0 re-ranked at
    shortlist=50 on the clustered test corpus — the SCALING.md round-11
    recall table's closing step).

    Scale shape: stage 1 is ivfpq_topk's (bucket join on probed lists,
    ADC fold, rank window); stage 2 fetches candidate vectors through a
    broadcast semi-join on the corpus scan — Q × shortlist rows cross
    the join, the corpus is never shuffled — and the exact distances
    are computed on Q × shortlist rows with a k-row window per query.
    Identity pin (tests): with every list probed and ``shortlist`` ≥
    corpus size this equals :func:`exact_l2_topk` row-for-row — the
    approximate stage only prunes, the re-rank restores exact order
    within whatever survives."""
    from ..functions.vector import squared_l2

    if shortlist < k:
        raise ValueError("shortlist must be >= k")
    cand = ivfpq_topk(
        corpus, queries, centroids, codebooks,
        k=shortlist, n_probe=n_probe, vec_col=vec_col, id_col=id_col,
    ).select("query_id", "neighbor_id")
    ids = cand.select(F.col("neighbor_id").alias(id_col)).distinct()
    vecs = corpus.join(F.broadcast(ids), id_col, "left_semi").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(squared_l2(F.col("qv"), F.col("cv")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """Production codebook training: one k-means per subspace over the
    sliced corpus. Returns codebooks for :func:`pq_encode`.

    At 100 TB, train on a deterministic sample (``sampling.hash_sample``
    — PQ codebooks converge on ~1e5-1e6 vectors), persist the codebooks,
    and re-encode the full corpus with the literal-compiled
    :func:`pq_encode` projection; the m sequential fits here are the
    test-scale convenience form. Tested by reconstruction error against
    the fixed codebooks (trained must be strictly better), not by SQL
    oracle — k-means init is the same non-oracle-able seam as
    build_ivf_index."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dsub = dim // m
    codebooks = []
    for s in range(m):
        sub = corpus.select(
            array_to_vector(
                F.slice(F.col(vec_col), s * dsub + 1, dsub).cast("array<double>")
            ).alias("fv")
        )
        km = KMeans(
            k=ksub, seed=seed + s, featuresCol="fv", predictionCol="c", maxIter=max_iter
        )
        codebooks.append(
            [[float(x) for x in ctr] for ctr in km.fit(sub).clusterCenters()]
        )
    return codebooks


def centroid_topk(
    embeddings: DataFrame, k: int = 20, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Top-k vectors closest (cosine) to the corpus centroid — the
    "most-central documents" probe of an embedding set (and the
    building block of the IVF coarse quantizer, one centroid at a time).

    The centroid is computed declaratively: ``posexplode → groupBy(pos)
    .avg → sort_array(collect_list(struct)) → transform`` reassembles a
    single array row, then a broadcast cross join scores every vector
    against it. At 100 TB the explode is dim× row fan-out but shuffles
    only (pos, partial-sum) pairs — dim rows per partition after
    map-side partials; the scoring pass is scan-speed with a 1-row
    build side. The ``collect_list`` window is over exactly dim rows.

    Cosine in double, rounded to 6dp before ranking (order-stable vs
    the oracle); rank tie-break on id.
    """
    from ..functions.vector import cosine_similarity

    exploded = embeddings.select(F.posexplode(vec_col).alias("pos", "v"))
    centroid = (
        exploded.groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )
    scored = embeddings.crossJoin(F.broadcast(centroid)).select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_similarity(F.col(vec_col), F.col("centroid")), 6).alias("cos_centroid"),
    )
    return scored.orderBy(F.desc("cos_centroid"), F.asc("vec_id")).limit(k)


def exact_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact squared-L2 top-k: (query_id, neighbor_id, d2, rank) —
    the ground truth the L2-metric ANN paths (IVF, IVF-PQ) are recalled
    against (:func:`brute_force_topk` is its cosine twin and the ground
    truth for the cosine paths). Self-matches excluded; d2 rounded to
    6dp before ranking with neighbor_id tie-break, so the rank set is
    total and engine-stable. Scale shape: the query set broadcasts,
    the corpus is scanned once, the window state per query is k rows."""
    from ..functions.vector import squared_l2

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(squared_l2(F.col("qv"), F.col("cv")), 6).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ann_recall_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of the IVF-PQ search against exact L2 ground truth —
    the metric every ANN deployment is tuned by (recall/latency is THE
    trade-off curve; Jégou et al. 2011 report exactly this number):
    ``(query_id, n_hits, recall)`` with recall = |approx top-k ∩ exact
    top-k| / k, one row per query INCLUDING zero-hit queries.

    Composes the two checked constituents verbatim —
    :func:`ivfpq_topk` (same centroids/codebooks/params as the
    registered ann_ivfpq_topk) and :func:`exact_l2_topk` — and joins
    their id sets. Scale shape: both sides end k rows per query, so
    the intersection join and the per-query count move Q×k rows at
    most; the exact side is one corpus scan (the eval is run on a
    query SAMPLE at 100 TB — ground truth is the expensive half by
    construction, which is the point of measuring recall on a sample
    rather than serving exact answers).

    Absolute recall depends entirely on how well-trained the quantizer
    is: the registered query's configuration is the DETERMINISTIC
    untrained one (first-8-vector centroids, fixed md5 codebooks,
    ksub=4 — chosen for oracle-ability, not quality), so its recall on
    random synthetic 64-dim embeddings is honestly low (~0.1); train
    centroids/codebooks on a sample (``pq_train``) to tune a real
    deployment, and this operator is the tuning loop's measurement."""
    approx = ivfpq_topk(
        corpus, queries, centroids, codebooks,
        k=k, n_probe=n_probe, vec_col=vec_col, id_col=id_col,
    )
    exact = exact_l2_topk(corpus, queries, k=k, vec_col=vec_col, id_col=id_col)
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    return (
        queries.select(F.col(id_col).alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6).alias(
                "recall"
            ),
        )
        .orderBy("query_id")
    )
