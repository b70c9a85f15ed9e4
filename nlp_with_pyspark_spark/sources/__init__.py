from .io import read_csv, read_parquet, read_table, read_tables, write_single_file

__all__ = ["read_csv", "read_parquet", "read_table", "read_tables", "write_single_file"]
