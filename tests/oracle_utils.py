"""Local replica of the driver's oracle comparison.

Runs a Spark query and its DuckDB oracle on the same sf dir and compares
row-count + column names + order-insensitive values — the same contract
the driver applies at sf0.01 (CORRECTNESS_r{N}.json). Keeping this exact
check in-tree means oracle drift is caught at `pytest` time, not at
round-verify time.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: queries are required to round floats to a
        # scale with big headroom, so identical post-round values stringify
        # identically here while genuine mismatches still show.
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def assert_oracle_match(spark, query_fn, sql: str, sf_dir: str, name: str = "?"):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(sql, sf_dir)
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"[{name}] column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"[{name}] row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    srows, orows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"[{name}] {len(mismatches)} value mismatches; first: {mismatches[0]}"
