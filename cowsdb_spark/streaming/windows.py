"""Streaming operators over the events stream.

Design for scale (the part the local test can't show but the plan
must): every aggregation below is keyed, so state is partitioned by
the shuffle on the grouping key across executors; watermarks bound
state size (late rows beyond the watermark are dropped instead of
accumulating); ``availableNow`` triggers give batch-backfill with
the same code. No driver-side state anywhere.

``sessionize_stateful`` shows the custom-operator escape hatch
(applyInPandasWithState) for semantics the built-ins lack — here,
per-user sessions that also carry a running value sum and enforce a
max session length, with an idle-timeout that closes sessions when
the watermark passes.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file stream (one parquet file = one
    micro-batch unit; in production this seam is Kafka/queue).

    FileStreamSource needs an explicit schema; take it from a batch
    schema read of the same file so the stream tracks whatever the
    driver wrote (TIMESTAMP(MICROS) today; TIMESTAMP(NANOS) in
    earlier testdata drops — handled via nanosAsLong)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    )
    raw = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = batch.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # nanos-as-long testdata
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Per-(window, event_type) counts + value sum with a watermark.

    State keyed by (window, event_type): the shuffle partitions state
    across executors; the watermark lets Spark drop windows older
    than max(event_ts) - watermark, so state is O(active windows),
    not O(stream length).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "c",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide
    overlapping windows (F.window's slideDuration form). Same bounded
    state story as tumbling — watermark caps active windows at
    O(window/slide x key cardinality), the factor a capacity plan
    must budget for at 100 TB/day stream rates."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "c",
            "value_sum",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (built-in session_window): a session
    extends while consecutive events are within ``gap``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.col("s.start").alias("s_start"),
            F.col("s.end").alias("s_end"),
            "n_events",
            "value_sum",
        )
    )


_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("s_start", T.TimestampType()),
        T.StructField("s_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_SESSION_STATE = "start long, last long, n long, vsum double"


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Custom sessionization via applyInPandasWithState.

    Same semantics as ``session_counts`` but hand-rolled, as the
    template for stateful logic the built-ins can't express. State
    per user_id is four scalars (micros start/last, count, sum) —
    bounded and partitioned by the group key. EventTimeTimeout closes
    a session when the watermark passes its idle gap.
    """

    def fn(
        key: Tuple[int],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "s_start": [pd.Timestamp(start, unit="us")],
                    "s_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "value_sum": [round(vsum, 2)],
                }
            )
            return

        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        vals = rows["value"].fillna(0.0)
        out = []
        if state.exists:
            start, last, n, vsum = state.get
        else:
            start, last, n, vsum = None, 0, 0, 0.0
        gap_us = gap_seconds * 1_000_000
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if start is None:
                start, last, n, vsum = t, t, 1, v
            elif t - last <= gap_us:
                last, n, vsum = max(last, t), n + 1, vsum + v
            else:
                out.append((user_id, start, last, n, vsum))
                start, last, n, vsum = t, t, 1, v
        state.update((start, last, n, vsum))
        state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)  # ms
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "s_start": [pd.Timestamp(r[1], unit="us") for r in out],
                    "s_end": [pd.Timestamp(r[2], unit="us") for r in out],
                    "n_events": [r[3] for r in out],
                    "value_sum": [round(r[4], 2) for r in out],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for at-least-once delivery: keep the first
    occurrence of each key, dropping redelivered rows across
    micro-batches.

    ``dropDuplicatesWithinWatermark`` keys the dedup state by *keys*
    and EVICTS entries once the watermark passes — state is
    O(keys within the watermark window), not O(stream length), which
    is what makes exactly-once ingest of a 100 TB/day feed viable
    (unbounded ``dropDuplicates`` state is the classic streaming OOM).
    Batch equivalence: ``df.dropDuplicates(keys)`` when every
    duplicate pair lands inside one watermark of each other.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete", state_partitions: int = 8
):
    """Drain a streaming DataFrame with availableNow into a memory
    sink; returns the finished query (caller reads table ``name``).

    The state-store partition count is pinned (low) for the drain:
    each state partition pays checkpoint/provider setup per
    micro-batch, which dominates small local drains at the session
    default of 32. On a real cluster, size ``state_partitions`` to
    total executor cores instead — it is fixed for the lifetime of a
    streaming checkpoint.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return q
