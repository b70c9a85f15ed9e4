"""Multi-dimensional data layout — Z-order clustering for scan pruning.

Partition pruning (sources/io.write_partitioned) skips whole
directories; row-group min/max statistics skip pages WITHIN files — but
only if the writer clustered the data so each file/row-group covers a
narrow value range. A plain sort clusters ONE column; a 100 TB fact
table is filtered by several (customer AND date, lang AND quality).
Z-ordering interleaves the bits of the filter columns' normalized
ranks, so sorting by the single Z key gives every participating column
locality simultaneously — each output file's [min, max] envelope stays
narrow on ALL of them, and a filter on ANY of them prunes most files
via parquet footer stats alone (the same layout trick Delta Lake's
OPTIMIZE ZORDER BY applies; here as plain open Spark over parquet).

Everything is a Catalyst expression: normalize each column to a
``bits``-bit integer against its measured [min, max] (one bounded agg
row fetched to the driver), interleave with a shift/or fold, then
``repartitionByRange`` + ``sortWithinPartitions`` on the key. No UDFs,
no collect beyond the 1-row bounds fetch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension — 3 dims × 16 bits = 48-bit keys, well inside a
#: BIGINT; 16 bits ≈ 65k distinct ranks per dim, far finer than any
#: realistic file count
_BITS = 16


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """col → integer rank in [0, 2^bits) against fixed [lo, hi] bounds
    (values outside clamp to the edges, so stale bounds degrade
    locality, never correctness)."""
    if lo is None or hi is None or hi <= lo:
        # constant (or caller-supplied unbounded/all-null) column: every
        # row ranks 0
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.least(
        (frac * F.lit(float(2**bits))).cast("long"), F.lit(2**bits - 1)
    )


def zorder_key(
    cols: list[Column],
    bounds: list[tuple[float, float]],
    bits: int = _BITS,
) -> Column:
    """The interleaved Z key: bit ``i`` of scaled column ``j`` lands at
    output bit ``i * n_cols + j``. Pure expression — scan speed at any
    scale."""
    n = len(cols)
    assert n >= 1 and bits * n <= 63, (n, bits)
    scaled = [
        _scaled(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds, strict=True)
    ]
    key = F.lit(0).cast("long")
    # static double loop → one flat OR tree; bits*n ≤ 63 terms, well
    # under expression-depth limits and fully codegen-able
    for i in range(bits):
        for j, s in enumerate(scaled):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return key


def measure_bounds(df: DataFrame, cols: list[str]) -> list[tuple[float, float]]:
    """[min, max] per column — ONE aggregation, one driver row (the
    bounded-fetch class). On an append-only production table these come
    from table stats instead of a scan; the contract is just 'fixed
    numbers at write time'."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    # an all-null or empty column has no bounds — map it to (0, 0) so it
    # takes the constant-column path in _scaled (every row ranks 0)
    # instead of surfacing as an opaque TypeError on `hi <= lo`
    return [
        (0.0, 0.0)
        if row[f"__lo_{c}"] is None or row[f"__hi_{c}"] is None
        else (row[f"__lo_{c}"], row[f"__hi_{c}"])
        for c in cols
    ]


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    n_files: int = 8,
    bits: int = _BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Z key of ``zcols`` (numeric columns; cast dates to
    days upstream). Every file then covers a narrow [min, max] envelope
    on EVERY z column — asserted against the actual parquet footer
    statistics, vs a random layout, in tests/test_layout.py."""
    bounds = measure_bounds(df, zcols)
    key = zorder_key([F.col(c) for c in zcols], bounds, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
