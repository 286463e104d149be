"""Streaming sketch ingest: presketch each micro-batch, append to a
sketch table, answer queries by rollup — the 100 TB ingest story for
the sketch family (operators/sketches.py).

Why this composition instead of a stateful streaming aggregate: a
watermarked streaming groupBy holds its state inside the query's
checkpoint, answers only the grouping it was started with, and must
be drained to be read. A SKETCH TABLE is an ordinary parquet table —
any coarser grouping, any engine, any time — and because the
histogram/CMS sketches merge by EXACT element-wise sums, the rollup
over per-batch sketches equals the batch computation over all rows
as integer equality (asserted in tests/test_streaming_sketches.py).
HLL states merge too (within the estimate envelope).

Exactly-once without streaming state: each micro-batch writes its
sketch rows to ``sink_dir/batch=<epoch_id>`` with OVERWRITE — a
replayed batch (foreachBatch is at-least-once on failure) rewrites
the same directory instead of double-counting. The reader just scans
``sink_dir`` (Spark reads ``batch=<id>`` as a partition column,
dropped by the rollup's projection).

At cluster scale the per-batch write is sketch-sized (groups x
buckets rows), not data-sized — the raw stream is never retained.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame


def presketch_ingest(
    stream_df: DataFrame,
    presketch: Callable[[DataFrame], DataFrame],
    sink_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start a foreachBatch ingest: ``presketch`` (any of the
    operators/sketches.py presketch builders, partially applied) runs
    on each micro-batch; its output lands in ``sink_dir/batch=<id>``
    idempotently. Returns the started StreamingQuery — callers
    ``awaitTermination()`` it (availableNow drains the backlog and
    stops, the backfill trigger; pass ``available_now=False`` for a
    continuous ingest)."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        presketch(batch_df).write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch={epoch_id}")
        )

    w = stream_df.writeStream.foreachBatch(_write)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_sketches(spark, sink_dir: str) -> DataFrame:
    """The accumulated sketch table (the ``batch`` partition column
    retained — a rollup's groupBy simply ignores it)."""
    return spark.read.parquet(sink_dir)
