from .inspect import (
    ancestor_chains,
    assert_no_shuffle_joins,
    count_occurrences,
    exchanges_covering,
    final_plan_string,
    pushed_filters,
    plan_string,
    scan_columns,
)

__all__ = [
    "ancestor_chains",
    "assert_no_shuffle_joins",
    "count_occurrences",
    "exchanges_covering",
    "final_plan_string",
    "pushed_filters",
    "plan_string",
    "scan_columns",
]
