"""Streaming joins (SURVEY §2 STRM tier; reference parity target is
the streaming extension, beyond the reference's own batch engine).

Two shapes a 100 TB/day feed needs:

- **stream-static enrichment**: each micro-batch joins a (small)
  dimension snapshot. The dimension broadcasts, so the stream never
  shuffles for the join — the enrich cost is O(batch), state is zero.
- **stream-stream interval join**: both sides watermarked, the join
  range-bounded on event time. Spark buffers each side's rows in
  keyed state ONLY until the watermark passes the interval bound, so
  state is O(rate x interval), not O(stream) — the property that
  keeps a day-scale feed joinable on a fixed-size cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Enrich a stream with a static dimension: broadcast hash join
    per micro-batch; no streaming state, no stream shuffle."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner join of two streams on ``key`` where the right row lands
    within ``[left_ts - within, left_ts + within]``.

    Both inputs get event-time watermarks; together with the interval
    condition that lets Spark expire buffered rows — each side's state
    holds at most (watermark + within) of data per key partition.
    Column collisions from the right side are suffixed ``_r``.
    """
    lw = left.withWatermark(left_ts, watermark)
    taken = set(left.columns)
    renames = [
        (c, f"{c}_r") for c in right.columns
        if c in taken and c not in (key,)
    ]
    rw = right
    for old, new in renames:
        rw = rw.withColumnRenamed(old, new)
    rts = f"{right_ts}_r" if (right_ts, f"{right_ts}_r") in renames else right_ts
    rw = rw.withWatermark(rts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[rts] >= F.expr(f"{left_ts} - INTERVAL {within}"))
        & (rw[rts] <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
