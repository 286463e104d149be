"""Plan inspection helpers — `.explain` assertions for tests and the
EXPLAIN statement surface."""

from .inspect import explain_str, has_pushed_filters, scan_read_schema  # noqa: F401
