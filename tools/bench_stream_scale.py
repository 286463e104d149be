"""Structured-Streaming scale run: every streaming operator family
over a 10M-event synthetic feed, measured end-to-end with
availableNow (the batch-backfill trigger — identical code to the
live-stream deployment).

Stages and what each one's cost means at cluster scale:

- tumbling / sliding windowed aggregation — state keyed by
  (window, event_type); JVM-side, watermark-bounded
- built-in session windows — state keyed by (session, user); the
  merge-adjacent-sessions path
- stateful sessionization (applyInPandasWithState) — the custom
  Python-state path; its throughput ratio vs the built-in is the
  price of dropping to Python state, worth knowing before choosing
  it at 100 TB/day
- streaming dedup (dropDuplicatesWithinWatermark) — state is
  O(keys per watermark window), the eviction behavior that keeps
  exactly-once ingest viable

Events arrive as 16 parquet files = 16 micro-batches
(maxFilesPerTrigger=1), draining to a noop sink so the measurement
is operator + state cost, not result materialization.

Writes BENCH_STREAM_10M.json.
Usage: python tools/bench_stream_scale.py [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_STREAM_10M.json")
FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "events_stream")
N_FILES = 16


def ensure_events(n: int) -> str:
    """n synthetic events as N_FILES parquet files (one per
    micro-batch): ts increasing across one day, zipf users, 8 event
    types, 2% duplicate event_ids (re-delivery for the dedup stage)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(FIX_DIR, f".complete-{n}")
    if os.path.exists(marker):
        return FIX_DIR
    os.makedirs(FIX_DIR, exist_ok=True)
    for f in os.listdir(FIX_DIR):
        os.remove(os.path.join(FIX_DIR, f))
    rng = np.random.default_rng(7)
    per = n // N_FILES
    base = 1720000000
    users = rng.integers(1, 2**40, size=max(n // 100, 100))
    for i in range(N_FILES):
        ts = np.sort(
            rng.integers(base + i * (86400 // N_FILES),
                         base + (i + 1) * (86400 // N_FILES), size=per)
        ).astype("datetime64[s]").astype("datetime64[us]")
        eid = np.arange(i * per + 1, (i + 1) * per + 1, dtype=np.int64)
        dup = rng.random(per) < 0.02
        eid[dup] = np.maximum(1, eid[dup] - rng.integers(1, 1000, size=int(dup.sum())))
        tbl = pa.table({
            "event_id": eid,
            "ts": ts,
            "user_id": users[rng.zipf(1.3, size=per).clip(max=len(users)) - 1],
            "event_type": np.array(
                ["view", "click", "scroll", "add", "buy", "search", "share", "exit"]
            )[rng.integers(0, 8, size=per)],
            "value": rng.random(per).round(3),
        })
        pq.write_table(tbl, os.path.join(FIX_DIR, f"part-{i:03d}.parquet"),
                       row_group_size=1 << 18)
    open(marker, "w").close()
    return FIX_DIR


def drain(df, output_mode: str, state_partitions: int = 32) -> float:
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        t0 = time.perf_counter()
        q = (df.writeStream.format("noop")
             .outputMode(output_mode)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import types as T

    from cowsdb_spark.session import get_spark
    from cowsdb_spark.streaming.windows import (
        dedup_stream,
        session_counts,
        sessionize_stateful,
        sliding_counts,
        tumbling_counts,
    )

    path = ensure_events(n)
    spark = get_spark("bench-stream")
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

    stages = {}
    # session windows + applyInPandasWithState + dedup emit in
    # append mode (finalized-on-watermark); plain windowed aggs in
    # update mode (the live-dashboard shape)
    from pyspark.sql import functions as F

    from cowsdb_spark.streaming.joins import (
        stream_static_enrich,
        stream_stream_interval_join,
    )

    # stream-static: enrich with a per-type dimension snapshot
    dim = (spark.read.parquet(path).groupBy("event_type")
           .agg(F.avg("value").alias("type_avg")))
    enrich = stream_static_enrich(stream(), dim, "event_type")
    # stream-stream: buys joined to views on a uniform derived key
    # within ±5 minutes, both sides watermarked at 30 min. The key is
    # deliberately uniform (event_id % 100k, ~12 rows/side/key/day):
    # this stage measures the operator's state/throughput cost, not
    # output volume — joining on the zipf user_id would make the top
    # user (~25% of events) emit ~10^8 pairs and measure pair
    # materialization instead. State is O(rate x interval).
    def jside(et):
        return (stream().filter(f"event_type = '{et}'")
                .select((F.col("event_id") % 100_000).alias("k"),
                        "ts", "event_id"))

    sjoin = stream_stream_interval_join(
        jside("buy"), jside("view"),
        key="k", within="5 minutes", watermark="30 minutes",
    )

    for name, df, mode in (
        ("tumbling_1h", tumbling_counts(stream()), "update"),
        ("sliding_1h_15m", sliding_counts(stream()), "update"),
        ("session_builtin_30m", session_counts(stream()), "append"),
        ("session_stateful_30m", sessionize_stateful(stream()), "append"),
        ("dedup_watermark", dedup_stream(stream()), "append"),
        ("static_enrich_join", enrich, "append"),
        ("interval_join_5m", sjoin, "append"),
    ):
        wall = drain(df, mode)
        stages[name] = {
            "wall_s": round(wall, 1),
            "events_per_s": int(n / wall),
        }
        print(name, stages[name], flush=True)

    # ---- streaming near-dup screen vs the persisted LSH store (r9,
    # VERDICT r8 #6): the zero-state claim as measured numbers. A 10M
    # doc signature store is banded and persisted ONCE (batch — the r8
    # incremental-dedup store); a 1M-doc increment then streams in 8
    # micro-batches and band-joins the store per batch (stream-static
    # inner join, no watermark state). Cells: the same candidates
    # computed batch-side in one pass, the stream against the PLAIN
    # parquet store (store re-sorted per micro-batch — the cost of
    # naive layout × micro-batch count), and against the BUCKETED
    # (band, bh) table (store-side exchange eliminated; the 100 TB
    # layout). Docs/s compares to BENCH_DEDUP_INCR's batch increment
    # on the same corpus split.
    import shutil

    from cowsdb_spark.operators.dedup import (
        banded_keys,
        minhash_signature_table,
    )
    from cowsdb_spark.streaming.joins import stream_neardup_candidates
    from tools.gen_docs import generate

    n_seen = 10_000_000 if n >= 10_000_000 else max(n // 10, 100_000)
    n_new = n_seen // 10
    dpath = generate(n=2 * n_seen)
    docs_all = spark.read.parquet(dpath)
    seen = docs_all.filter(F.col("doc_id") % 2 == 0)
    new = docs_all.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 2 * n_new)
    )
    banded_dir = os.path.join("/tmp", f"moospark-stream-bands-{os.getpid()}")
    stream_dir = os.path.join("/tmp", f"moospark-stream-docs-{os.getpid()}")
    shutil.rmtree(banded_dir, ignore_errors=True)
    shutil.rmtree(stream_dir, ignore_errors=True)
    t0 = time.perf_counter()
    banded_keys(
        minhash_signature_table(seen), "doc_id", 32, 8
    ).write.parquet(banded_dir)
    neardup = {"n_store_docs": n_seen, "n_stream_docs": n_new,
               "store_build_s": round(time.perf_counter() - t0, 1)}
    bucket_tbl = "bench_stream_sig_bands"
    spark.sql(f"DROP TABLE IF EXISTS {bucket_tbl}")
    t0 = time.perf_counter()
    spark.read.parquet(banded_dir).write.bucketBy(8, "band", "bh").mode(
        "overwrite"
    ).saveAsTable(bucket_tbl)
    neardup["store_bucket_layout_s"] = round(time.perf_counter() - t0, 1)
    new.repartition(8).write.parquet(stream_dir)

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])

    def doc_stream():
        return (spark.readStream.schema(doc_schema)
                .option("maxFilesPerTrigger", 1).parquet(stream_dir))

    # batch baseline: same candidates, one pass
    t0 = time.perf_counter()
    batch_n = (
        banded_keys(
            minhash_signature_table(spark.read.parquet(stream_dir)),
            "doc_id", 32, 8,
        )
        .join(
            spark.read.parquet(banded_dir).select(
                F.col("doc_id").alias("seen_id"), "band", "bh"
            ),
            ["band", "bh"],
        )
        .count()
    )
    wall = time.perf_counter() - t0
    neardup["batch_one_pass"] = {
        "wall_s": round(wall, 1),
        "docs_per_s": int(n_new / wall),
        "candidates": batch_n,
    }
    print("neardup batch:", neardup["batch_one_pass"], flush=True)

    # third lane: the static store CACHED for the stream's lifetime —
    # stream-static joins re-execute the static side every micro-batch
    # (the dominant cost in the first two lanes: 8 store scans); a
    # long-running screen pins the slim (band, bh, id) store in memory
    # once and each micro-batch pays only its own keys
    cached_store = spark.read.parquet(banded_dir).persist()
    cached_store.count()
    try:
        for label, store in (
            ("stream_plain_store", spark.read.parquet(banded_dir)),
            ("stream_bucketed_store", spark.table(bucket_tbl)),
            ("stream_cached_store", cached_store),
        ):
            wall = drain(
                stream_neardup_candidates(doc_stream(), store), "append"
            )
            neardup[label] = {
                "wall_s": round(wall, 1),
                "docs_per_s": int(n_new / wall),
                "micro_batches": 8,
            }
            print("neardup", label, neardup[label], flush=True)
    finally:
        cached_store.unpersist()
    spark.sql(f"DROP TABLE IF EXISTS {bucket_tbl}")
    shutil.rmtree(banded_dir, ignore_errors=True)
    shutil.rmtree(stream_dir, ignore_errors=True)
    stages["neardup_screen_vs_lsh_store"] = neardup

    doc = {
        "n_events": n,
        "micro_batches": N_FILES,
        "stages": stages,
        "protocol": "availableNow drain to noop sink, 32 state partitions, "
                    "16 parquet micro-batches, fresh session",
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
