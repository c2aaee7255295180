from .tables import TABLE_NAMES, Tables, load_table

__all__ = ["TABLE_NAMES", "Tables", "load_table"]
