from .tables import TABLES, ensure_parallelism, load_tables, read_table, register_views

__all__ = [
    "TABLES",
    "ensure_parallelism",
    "load_tables",
    "read_table",
    "register_views",
]
