"""Table-function sources: ``url(...)``, ``file(...)`` (SURVEY §2.1
S3/S9)."""

from .url import resolve_table_functions  # noqa: F401
