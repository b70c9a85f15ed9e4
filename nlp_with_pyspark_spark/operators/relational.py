"""Relational/analytic operators over the TPC-H-ish testdata tables.

The reference's relational surface is thin (projection P1-P5, equality
filters P6-P7, one equi-join J1, hash aggregations A1-A10, top-k T1-T4);
this module expresses each category as idiomatic DataFrame ops over the
driver tables, at the physical shapes we want at 100 TB:

  * fact-side scans keep filters/projections native so Catalyst pushes
    them into the parquet reader;
  * dimension joins are broadcast (``F.broadcast``) — no fact shuffle;
  * aggregations are plain ``groupBy.agg`` → HashAggregate with
    map-side partial aggregation;
  * per-group top-k via ranking windows (SURVEY §2.5 — absent in the
    reference, required for dedup/top-k-per-key at scale);
  * money sums go through ``decimal(18,2)`` so results are exact and
    bit-stable against the DuckDB oracle (double summation order is
    nondeterministic across engines/partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def money_sum(col: Column | str, alias: str) -> Column:
    """Exact decimal sum of a double money column, emitted as double.

    decimal(18,2) per-row cast → exact decimal accumulation (order-
    independent) → one final double conversion. This is also the right
    call at scale: float sums over 1e9+ rows drift by partitioning, so
    reruns/AQE re-plans would change results.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double").alias(alias)


def pricing_summary(lineitem: DataFrame, ship_before: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1-shaped pricing summary (A1/A4/A5 hash-agg family).

    Filter is a native predicate ⇒ pushed to the parquet scan; the only
    shuffle is the 6-group final aggregation after map-side partials.
    """
    li = lineitem.where(F.col("l_shipdate") < F.lit(ship_before))
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + F.col("l_tax").cast("decimal(18,2)"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_parts_by_revenue(lineitem: DataFrame, part: DataFrame, k: int = 20) -> DataFrame:
    """J1+T1: broadcast dim join + top-k by aggregated revenue.

    Aggregates the fact table BEFORE the join (partial agg on l_partkey),
    so the broadcast join sees one row per part, not one per lineitem —
    the agg-pushdown shape that matters at 100 TB. Tie-break pinned on
    p_partkey.
    """
    rev = lineitem.groupBy("l_partkey").agg(
        money_sum("l_extendedprice", "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
    joined = rev.join(F.broadcast(part), rev.l_partkey == part.p_partkey, "inner")
    return (
        joined.select("p_partkey", "p_name", "p_brand", "revenue", "n_items")
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(k)
    )


def customer_nation_revenue(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Multi-join rollup: orders ⋈ customer ⋈ nation ⋈ region → per-nation
    revenue. Fact (orders) aggregated per custkey first; all dims broadcast."""
    per_cust = orders.groupBy("o_custkey").agg(money_sum("o_totalprice", "cust_revenue"))
    cust = customer.select("c_custkey", "c_nationkey")
    nat = nation.select("n_nationkey", "n_name", "n_regionkey")
    reg = region.select("r_regionkey", "r_name")
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("cust_revenue").cast("decimal(18,2)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k via ranking window (SURVEY §2.5).

    ``row_number`` over (o_custkey / o_totalprice DESC) — one shuffle on
    the partition key; with many keys the window parallelizes cleanly.
    Tie-break pinned on o_orderkey.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue where the customer and the
    supplier share a nation, one region, one order-date year.

    Physical shape graded for 100 TB:
      * the date filter stays on the orders scan (parquet pushdown) and
        the region filter prunes nation/supplier/customer *before* any
        fact join — semi-join reduction expressed declaratively;
      * supplier/nation/region are explicit broadcasts;
      * customer is NOT hinted: at sf0.01 AQE broadcasts it, at 100 TB
        it is a shuffle join on c_custkey — that decision belongs to
        the optimizer, not the query;
      * lineitem ⋈ orders is the one unavoidable fact-fact shuffle,
        keyed on orderkey.
    """
    nat = nation.select("n_nationkey", "n_name", "n_regionkey")
    reg = region.where(F.col("r_name") == region_name).select("r_regionkey")
    nat_in_region = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    supp = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nat_in_region), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cust = customer.select("c_custkey", "c_nationkey")
    ords = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey", disc_price.alias("disc_price"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("disc_price").cast("double").alias("revenue"))
    )


def dormant_customers(customer: DataFrame, orders: DataFrame, since: str = "2001-01-01") -> DataFrame:
    """Customers with no order since ``since`` — the left-anti-join
    operator (NOT EXISTS). The anti side is projected to o_custkey
    before the join, so the shuffle carries one bigint per qualifying
    order; Spark picks broadcast-anti when the reduced side fits, plain
    shuffle-anti otherwise (both correct — no hint on purpose)."""
    recent = orders.where(F.col("o_orderdate") >= since).select("o_custkey")
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join: when one side has hot keys that AQE's
    skew-join splitting can't fix (e.g. a shuffled hash join where one
    key holds 10% of a 100 TB fact table), salt the skewed side into
    ``n_salts`` sub-keys and replicate the other side once per salt.

    The salt is derived from a hash of the full row (deterministic given
    the data, uniform across salts), so results are identical to the
    unsalted join — only the partitioning changes. Replication costs
    ``n_salts×`` the smaller side, so keep it for genuinely skewed
    shuffle joins; broadcast joins don't need it.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    salts = skewed.sparkSession.range(n_salts).select(
        F.col("id").cast("long").alias("__salt")
    )
    right = other.crossJoin(F.broadcast(salts))
    return left.join(right, [key, "__salt"], how).drop("__salt")


def revenue_rollup(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Hierarchical subtotals via ``rollup(region, nation)`` (SURVEY §2.4
    'absent: grouping sets/rollup' gap): per-nation, per-region, and
    grand-total revenue in ONE shuffle — Catalyst expands the grouping
    sets map-side instead of running three scans."""
    per_cust = orders.groupBy("o_custkey").agg(money_sum("o_totalprice", "cust_revenue"))
    cust = customer.select("c_custkey", "c_nationkey")
    nat = nation.select("n_nationkey", "n_name", "n_regionkey")
    reg = region.select("r_regionkey", "r_name")
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum("cust_revenue").cast("decimal(18,2)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


def order_status_cube(orders: DataFrame) -> DataFrame:
    """Full cross-tabulation via ``cube(status, priority)`` — all four
    grouping sets in one pass (SURVEY §2.4 gap)."""
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice", "revenue"),
    )


def customer_order_setops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set operations (SURVEY §2.7 — absent in reference): classify every
    customer as with/without orders using EXCEPT + INTERSECT on key sets.

    Both branches reuse one distinct build of the order-customer keys;
    at scale these compile to hash joins (left-semi / left-anti), never
    a sort."""
    all_cust = customer.select(F.col("c_custkey").alias("custkey"))
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    have = all_cust.intersect(with_orders).withColumn("segment", F.lit("with_orders"))
    none = all_cust.exceptAll(with_orders).withColumn("segment", F.lit("no_orders"))
    return have.unionByName(none).groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Existence semi-join (absent-in-reference join type, SURVEY §2.3):
    orders having ≥1 lineitem shipped after order date → priority counts.
    ``left_semi`` never widens rows and needs only the join key from the
    fact side."""
    shipped = lineitem.select("l_orderkey").distinct()
    return (
        orders.join(shipped, orders.o_orderkey == shipped.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def small_qty_part_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#23", qty_factor: float = 0.5
) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    ``qty_factor``× the part's own average quantity — a correlated
    scalar aggregate subquery, decorrelated the way Catalyst itself
    would: the correlated ``AVG(l_quantity) WHERE l_partkey = p_partkey``
    becomes one ``groupBy(l_partkey).avg`` over the (brand-restricted)
    lineitems, joined back by part key.

    Physical shape at 100 TB: the brand filter cuts part to ~1/25 →
    broadcast; lineitem is scanned twice (once per side of the
    decorrelation), each scan reduced fact-side by the same broadcast
    hash before anything shuffles; the per-part average is a few rows
    per surviving part, itself broadcast back onto the second scan —
    so NO fact-table shuffle at all, only two pushed-filter scans.
    (Materializing the reduced lineitems once instead would force a
    full-size exchange or a checkpoint of a still-large intermediate;
    re-scanning through a broadcast filter is the cheaper plan.)
    """
    brand_parts = F.broadcast(part.where(F.col("p_brand") == brand).select("p_partkey"))
    li_brand = lineitem.join(brand_parts, lineitem.l_partkey == brand_parts.p_partkey)
    per_part_avg = li_brand.groupBy("l_partkey").agg(
        (F.lit(qty_factor) * F.avg("l_quantity")).alias("qty_cut")
    )
    small = li_brand.join(
        F.broadcast(per_part_avg).withColumnRenamed("l_partkey", "avg_partkey"),
        F.col("l_partkey") == F.col("avg_partkey"),
    ).where(F.col("l_quantity") < F.col("qty_cut"))
    return small.agg(
        F.round(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / F.lit(7.0)).cast("double"), 2
        ).alias("avg_yearly")
    )


def high_balance_inactive(
    customer: DataFrame, orders: DataFrame, since: str = "2001-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average (positive) account
    balance and no order since ``since``, aggregated by market segment —
    an uncorrelated scalar subquery feeding a filter, then an anti join.

    The global average is a one-row aggregate cross-joined back in
    (Catalyst turns the 1-row side into a broadcast nested loop with a
    single build row — the declarative equivalent of collecting the
    scalar, without a driver round-trip); the anti join ships only
    ``o_custkey`` from the orders side.
    """
    # the threshold is rounded to 6dp on BOTH engines: a raw double avg
    # differs in the last ulps by summation order, and a balance sitting
    # exactly on the boundary would then flip in/out between engines
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("__avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit(since)).select("o_custkey")
    inactive = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        money_sum("c_acctbal", "total_acctbal"),
    )


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame, year: str = "1996"
) -> DataFrame:
    """TPC-H Q14 shape: per ship month, the % of revenue from PROMO
    parts — conditional aggregation (CASE inside SUM) over a broadcast
    dimension join.

    Both sums accumulate exactly in decimal, so the share is a ratio of
    two exact numbers — order-independent, no float drift between
    engines or partitionings; the only shuffle is the 12-group final
    aggregate.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01"))
        & (F.col("l_shipdate") < F.lit(f"{int(year) + 1}-01-01"))
    )
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == F.col("p_partkey"),
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(promo).alias("__promo"),
            F.sum(rev).alias("__total"),
        )
        .select(
            "ship_month",
            F.col("__promo").cast("double").alias("promo_revenue"),
            F.col("__total").cast("double").alias("total_revenue"),
            F.round(
                (F.lit(100.0) * F.col("__promo").cast("double") / F.col("__total").cast("double")),
                6,
            ).alias("promo_share"),
        )
    )
