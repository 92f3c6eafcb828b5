from .tables import TABLE_NAMES, load_table, register_tables

__all__ = ["TABLE_NAMES", "load_table", "register_tables"]
