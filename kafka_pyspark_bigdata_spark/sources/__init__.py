from .batch import load_table, table_path  # noqa: F401
