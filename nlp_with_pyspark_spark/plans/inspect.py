"""Physical-plan inspection utilities.

No custom Catalyst rules are needed for this engine (SURVEY §4.2 —
every operator maps to built-in expressions); what lives here instead
is the tooling to *verify* Catalyst produced the plan we want. These
feed tests/test_plans.py and ad-hoc `.explain` iteration: at 100 TB a
plan regression (lost pushdown, broadcast degraded to shuffle, codegen
break) is a 100× slowdown no row-count test would catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Executed-plan tree as text (pre-execution: AQE not yet final)."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan_string(df: DataFrame) -> str:
    """Plan text AFTER executing the query, so AQE's final plan (with
    whole-stage-codegen `*(n)` span markers) is visible."""
    df.collect()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(mode)


def scan_columns(df: DataFrame, index: int = 0) -> set[str]:
    """Column names read by the index-th FileScan — the column-pruning
    check: a scan reading columns the query never uses is a bug."""
    plan = plan_string(df)
    chunks = plan.split("FileScan parquet [")[1:]
    cols = chunks[index].split("]")[0]
    return {c.split("#")[0] for c in cols.split(",") if c}


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lists of every scan in the plan."""
    plan = plan_string(df)
    return " ".join(
        chunk.split("]")[0] for chunk in plan.split("PushedFilters: [")[1:]
    )


def count_occurrences(df: DataFrame, op: str) -> int:
    """How many times an operator name appears in the plan tree — e.g.
    count_occurrences(df, 'BroadcastHashJoin') or a hash function name
    to detect accidental expression re-evaluation."""
    return plan_string(df).count(op)


def _plan_depth(line: str) -> int:
    # column of the child marker ("+- " / ":- ") — stable against
    # whole-stage-codegen "*(n)" prefixes that shift the name column
    hits = [i for i in (line.find("+- "), line.find(":- ")) if i >= 0]
    return min(hits) + 3 if hits else 0


def _ancestor_chains_indexed(df: DataFrame, needle: str) -> list[list[tuple[int, str]]]:
    """``ancestor_chains`` carrying each ancestor's plan-line index, so
    two distinct nodes that PRINT identically (same hashpartitioning
    expression at two plan sites) stay distinguishable."""
    lines = plan_string(df).splitlines()
    chains: list[list[tuple[int, str]]] = []
    for i, line in enumerate(lines):
        if needle not in line:
            continue
        chain: list[tuple[int, str]] = []
        d = _plan_depth(line)
        for j in range(i - 1, -1, -1):
            dj = _plan_depth(lines[j])
            if dj < d:
                d = dj
                chain.append((j, lines[j].strip()))
                if d == 0:
                    break
        chains.append(chain)
    return chains


def ancestor_chains(df: DataFrame, needle: str) -> list[list[str]]:
    """For EVERY plan line containing ``needle`` (e.g. a table-path
    fragment identifying a FileScan), the chain of its ancestor operator
    lines, nearest first. Works on the printed plan tree: a node's
    ancestors are exactly the earlier lines whose child marker sits at a
    strictly smaller indent column."""
    return [
        [op for _, op in chain] for chain in _ancestor_chains_indexed(df, needle)
    ]


def exchanges_covering(df: DataFrame, needle: str) -> int:
    """How many SHUFFLE Exchange nodes (BroadcastExchange excluded)
    have ``needle`` somewhere in their subtree — i.e. how many shuffles
    the rows scanned from that source must cross. 0 means the source is
    only ever consumed through broadcast/bucket-aligned operators.
    Nodes are identified by plan-line position, so two shuffles whose
    printed text coincides still count as two."""
    seen: set[int] = set()
    for chain in _ancestor_chains_indexed(df, needle):
        for idx, op in chain:
            if "Exchange" in op and "BroadcastExchange" not in op:
                seen.add(idx)
    return len(seen)


def assert_no_shuffle_joins(df: DataFrame) -> None:
    """Raise if any join in the plan shuffles both sides (SortMergeJoin /
    ShuffledHashJoin) — use on dimension-join plans that must broadcast."""
    plan = plan_string(df)
    bad = [op for op in ("SortMergeJoin", "ShuffledHashJoin") if op in plan]
    if bad:
        raise AssertionError(f"plan contains shuffle joins {bad}:\n{plan}")
