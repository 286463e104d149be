"""Streaming sketch ingest: per-micro-batch presketches appended to a
sketch table must roll up to EXACTLY the batch computation (histogram
and CMS merge by element-wise sums — integer equality, the property
HLL cannot give), and a replayed batch must not double-count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_batches(spark, tmp_path, n_files=4, n=2000):
    src = str(tmp_path / "docs_src")
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        ((F.col("id") * 17) % 100).cast("double").alias("v"),
        F.concat(F.lit("t"), (F.col("id") % 23).cast("string")).alias("tok"),
    )
    df.repartition(n_files).write.parquet(src)
    return src, df


def _stream(spark, src):
    batch = spark.read.parquet(src)
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


class TestStreamingSketchIngest:
    def test_hist_stream_rollup_equals_batch_exactly(self, spark, tmp_path):
        from cowsdb_spark.operators.sketches import hist_presketch, hist_rollup
        from cowsdb_spark.streaming.sketches import (
            presketch_ingest,
            read_sketches,
        )

        src, df = _write_batches(spark, tmp_path)
        sink = str(tmp_path / "sink")
        q = presketch_ingest(
            _stream(spark, src),
            lambda b: hist_presketch(b, ["source"], "v", 0.0, 100.0, bins=10),
            sink,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()
        # at least 2 micro-batches actually ran (per-batch dirs exist)
        assert len([d for d in os.listdir(sink) if d.startswith("batch=")]) >= 2
        got = {
            r.source: list(r.hist)
            for r in hist_rollup(
                read_sketches(spark, sink), ["source"]
            ).collect()
        }
        want = {
            r.source: list(r.hist)
            for r in hist_presketch(df, ["source"], "v", 0.0, 100.0, bins=10).collect()
        }
        assert got == want

    def test_cms_stream_rollup_equals_batch_exactly(self, spark, tmp_path):
        from cowsdb_spark.operators.sketches import cms_presketch, cms_rollup
        from cowsdb_spark.streaming.sketches import (
            presketch_ingest,
            read_sketches,
        )

        src, df = _write_batches(spark, tmp_path)
        sink = str(tmp_path / "sink")
        presketch_ingest(
            _stream(spark, src),
            lambda b: cms_presketch(b, ["source"], "tok", width=64, depth=4),
            sink,
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).awaitTermination()
        got = cms_rollup(read_sketches(spark, sink), []).collect()[0]
        want = cms_presketch(
            df.select(F.lit("x").alias("x"), "tok"), ["x"], "tok",
            width=64, depth=4,
        ).collect()[0]
        assert list(got.cms) == list(want.cms)

    def test_replayed_batch_does_not_double_count(self, spark, tmp_path):
        # the exactly-once mechanism: a replay rewrites batch=<id>
        # instead of appending — simulate by re-running the ingest
        # with a FRESH checkpoint over the same source (every batch id
        # is re-delivered) and asserting the rollup is unchanged
        from cowsdb_spark.operators.sketches import hist_presketch, hist_rollup
        from cowsdb_spark.streaming.sketches import (
            presketch_ingest,
            read_sketches,
        )

        src, df = _write_batches(spark, tmp_path, n_files=2)
        sink = str(tmp_path / "sink")
        for attempt in range(2):
            presketch_ingest(
                _stream(spark, src),
                lambda b: hist_presketch(b, ["source"], "v", 0.0, 100.0, bins=4),
                sink,
                checkpoint_dir=str(tmp_path / f"ckpt{attempt}"),
            ).awaitTermination()
        got = hist_rollup(read_sketches(spark, sink), []).collect()[0]
        want = hist_presketch(
            df.select(F.lit("x").alias("x"), "v"), ["x"], "v",
            0.0, 100.0, bins=4,
        ).collect()[0]
        assert list(got.hist) == list(want.hist)
