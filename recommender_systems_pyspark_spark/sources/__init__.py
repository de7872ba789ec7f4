from .loaders import TABLES, load_table, tables  # noqa: F401
