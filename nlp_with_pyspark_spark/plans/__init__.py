from .inspect import (
    assert_no_shuffle_joins,
    count_occurrences,
    final_plan_string,
    pushed_filters,
    plan_string,
    scan_columns,
)

__all__ = [
    "assert_no_shuffle_joins",
    "count_occurrences",
    "final_plan_string",
    "pushed_filters",
    "plan_string",
    "scan_columns",
]
