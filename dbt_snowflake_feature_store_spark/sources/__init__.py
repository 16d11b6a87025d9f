from .tables import (
    TABLES,
    ensure_parallelism,
    load_tables,
    normalize_frame,
    read_table,
    register_views,
)

__all__ = [
    "TABLES",
    "ensure_parallelism",
    "load_tables",
    "normalize_frame",
    "read_table",
    "register_views",
]
