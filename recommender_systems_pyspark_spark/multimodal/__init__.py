from .media import media_table  # noqa: F401
