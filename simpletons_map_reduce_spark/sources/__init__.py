from .tables import TABLES, load_table, load_tables, read_wholetext

__all__ = ["TABLES", "load_table", "load_tables", "read_wholetext"]
