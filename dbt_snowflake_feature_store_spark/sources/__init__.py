from .tables import TABLES, load_tables, read_table, register_views

__all__ = ["TABLES", "load_tables", "read_table", "register_views"]
