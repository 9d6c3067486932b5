from .tables import (
    TABLES,
    load_table,
    load_tables,
    read_wholetext,
    register_views,
    spread,
    sql,
)
from .sinks import (
    read_csv,
    read_jsonl,
    read_kv_text,
    write_csv,
    write_jsonl,
    write_kv_text,
    write_kv_text_sorted,
    write_parquet,
    write_parquet_clustered,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_wholetext",
    "register_views",
    "spread",
    "sql",
    "read_csv",
    "read_jsonl",
    "read_kv_text",
    "write_csv",
    "write_jsonl",
    "write_kv_text",
    "write_kv_text_sorted",
    "write_parquet",
    "write_parquet_clustered",
]
