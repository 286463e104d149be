"""RocksDB vs HDFSBacked state-store A/B on state-store METRICS
(r10, VERDICT r9 #4).

Wall-clock cannot resolve streaming on this box (t49 swings 7-48 s on
identical code — OPTIMIZATION_r09.md variance note), so the verdict
asks for the comparison the StreamingQueryProgress JSON supports:
per-batch commit latency, state bytes, and the provider's own custom
metrics (file counts / cache behavior), over the 10M-event 16-micro-
batch fixture from bench_stream_scale.

Protocol: one session; for each stateful stage the two providers run
INTERLEAVED (provider is a query-start conf; each drain gets a fresh
implicit checkpoint), `reps` rounds each; we keep the per-round sums
of commitTimeMs and the max of stateMemory, and report the min across
rounds per (stage, provider). The noop sink + availableNow trigger
make every drain identical-input batch backfill.

Usage: python tools/probe_statestore_r10.py [n_events] [reps]
Writes PROBE_STATESTORE_R10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PROBE_STATESTORE_R10.json")

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")


def progress_dicts(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        if isinstance(p, dict):
            out.append(p)
        else:  # StreamingQueryProgress object (Spark 4)
            out.append(json.loads(p.json))
    return out


def drain_with_metrics(df, output_mode: str, provider: str,
                       state_partitions: int = 32) -> dict:
    spark = df.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        t0 = time.perf_counter()
        q = (df.writeStream.format("noop")
             .outputMode(output_mode)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        wall = time.perf_counter() - t0
        progs = progress_dicts(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    commit_ms = 0
    state_bytes = 0
    rows_total = 0
    custom: dict[str, float] = {}
    n_batches = len(progs)
    for p in progs:
        for op in p.get("stateOperators", []):
            commit_ms += op.get("commitTimeMs", 0) or 0
            state_bytes = max(state_bytes, op.get("memoryUsedBytes", 0) or 0)
            rows_total = max(rows_total, op.get("numRowsTotal", 0) or 0)
            for k, v in (op.get("customMetrics") or {}).items():
                if isinstance(v, (int, float)):
                    custom[k] = custom.get(k, 0) + v
    keep = {k: v for k, v in custom.items()
            if any(s in k.lower() for s in
                   ("file", "bytes", "commit", "miss", "hit", "pause",
                    "compact", "flush"))}
    return {
        "wall_s": round(wall, 2),
        "n_batches": n_batches,
        "commit_ms_total": commit_ms,
        "state_bytes_max": state_bytes,
        "state_rows_max": rows_total,
        "custom": keep,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from pyspark.sql import types as T

    from cowsdb_spark.session import get_spark
    from cowsdb_spark.streaming.windows import (
        dedup_stream,
        session_counts,
        sliding_counts,
        tumbling_counts,
    )
    from tools.bench_stream_scale import ensure_events

    path = ensure_events(n)
    spark = get_spark("probe-statestore")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(path))

    from pyspark.sql import functions as F

    from cowsdb_spark.streaming.joins import stream_stream_interval_join

    def jside(et):
        return (stream().filter(f"event_type = '{et}'")
                .select((F.col("event_id") % 100_000).alias("k"),
                        "ts", "event_id"))

    stages = {
        "tumbling_1h": lambda: (tumbling_counts(stream()), "update"),
        "sliding_1h_15m": lambda: (sliding_counts(stream()), "update"),
        "session_builtin_30m": lambda: (session_counts(stream()), "append"),
        "dedup_watermark": lambda: (dedup_stream(stream()), "append"),
        "interval_join_5m": lambda: (stream_stream_interval_join(
            jside("buy"), jside("view"),
            key="k", within="5 minutes", watermark="30 minutes"), "append"),
    }

    results: dict[str, dict] = {}
    for name, mk in stages.items():
        per_provider: dict[str, dict] = {}
        for r in range(reps):
            for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
                df, mode = mk()
                spark.sparkContext.setJobDescription(
                    f"statestore:{name}:{label}:r{r}")
                try:
                    m = drain_with_metrics(df, mode, provider)
                except Exception as e:  # noqa: BLE001
                    per_provider[label] = {"err": repr(e)[:300]}
                    continue
                best = per_provider.get(label)
                if (best is None or "err" in best
                        or m["commit_ms_total"] < best["commit_ms_total"]):
                    per_provider[label] = m
                print(f"{name} {label} r{r}: wall={m['wall_s']}s "
                      f"commit={m['commit_ms_total']}ms "
                      f"state={m['state_bytes_max']}B",
                      file=sys.stderr, flush=True)
        results[name] = per_provider

    doc = {
        "n_events": n,
        "reps": reps,
        "protocol": ("interleaved per stage, min-commit round kept; "
                     "noop sink, availableNow, 32 state partitions, "
                     "16 parquet micro-batches, one session"),
        "stages": results,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
