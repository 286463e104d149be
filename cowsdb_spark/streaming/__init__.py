"""Structured Streaming extension (north-star, SURVEY §7 G / §2.10).

The reference is batch-only — SURVEY §2.10 records that explicitly,
and nothing here is claimed as reference parity. This package is the
100 TB-pipeline extension: the same events schema consumed as a
stream, with watermarked windowed aggregation, session windows, and
a custom stateful operator via ``applyInPandasWithState``.
"""

from .windows import (
    dedup_stream,
    session_counts,
    sessionize_stateful,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "session_counts",
    "sessionize_stateful",
    "dedup_stream",
]
