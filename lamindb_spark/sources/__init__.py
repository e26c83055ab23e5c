from .readers import load_table, load_tables, read_payload  # noqa: F401
