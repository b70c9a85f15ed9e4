from .io import (
    ensure_parallelism,
    read_csv,
    read_jsonl,
    read_parquet,
    read_table,
    read_tables,
    write_bucketed,
    write_partitioned,
    write_single_file,
)

__all__ = [
    "ensure_parallelism",
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "read_table",
    "read_tables",
    "write_bucketed",
    "write_partitioned",
    "write_single_file",
]
