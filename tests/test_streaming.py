"""Structured Streaming extension tests (SURVEY §7 G; §2.10 records
the reference as batch-only — this surface is an extension).

Strategy: drain the stream with an availableNow trigger into a
memory sink, then compare against the same aggregation computed in
batch over the same parquet — streaming results must equal batch
results once the stream is fully drained.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cowsdb_spark.catalog import load_table
from cowsdb_spark.streaming import (
    session_counts,
    sessionize_stateful,
    stream_events,
    tumbling_counts,
)
from cowsdb_spark.streaming.windows import run_to_memory


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


class TestTumbling:
    def test_matches_batch(self, spark, sf_dir, batch_events):
        s = tumbling_counts(stream_events(spark, sf_dir), window="1 hour")
        run_to_memory(s, "tumbling_out", "complete")
        got = {
            (r.w_start, r.event_type): (r.c, r.value_sum)
            for r in spark.table("tumbling_out").collect()
        }
        want = {
            (r.w_start, r.event_type): (r.c, r.value_sum)
            for r in (
                batch_events.groupBy(
                    F.window("ts", "1 hour").alias("w"), "event_type"
                )
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.round(F.sum("value"), 2).alias("value_sum"),
                )
                .select(F.col("w.start").alias("w_start"), "event_type", "c", "value_sum")
                .collect()
            )
        }
        assert got == want and len(got) > 0


class TestSliding:
    def test_matches_batch(self, spark, sf_dir, batch_events):
        from cowsdb_spark.streaming.windows import sliding_counts

        s = sliding_counts(
            stream_events(spark, sf_dir), window="1 hour", slide="15 minutes"
        )
        run_to_memory(s, "sliding_out", "complete")
        got = {
            (r.w_start, r.event_type): (r.c, r.value_sum)
            for r in spark.table("sliding_out").collect()
        }
        want = {
            (r.w_start, r.event_type): (r.c, r.value_sum)
            for r in sliding_counts(
                batch_events, window="1 hour", slide="15 minutes"
            ).collect()
        }
        assert got == want and len(got) > 0
        # every event lands in window/slide = 4 overlapping windows
        n_events = batch_events.count()
        assert sum(c for c, _ in want.values()) == 4 * n_events


class TestSessionWindow:
    def test_matches_batch(self, spark, sf_dir, batch_events):
        s = session_counts(stream_events(spark, sf_dir), gap="30 minutes")
        run_to_memory(s, "session_out", "complete")
        got = {
            (r.user_id, r.s_start, r.s_end): (r.n_events, r.value_sum)
            for r in spark.table("session_out").collect()
        }
        want = {
            (r.user_id, r.s_start, r.s_end): (r.n_events, r.value_sum)
            for r in (
                batch_events.groupBy(
                    F.session_window("ts", "30 minutes").alias("s"), "user_id"
                )
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum("value"), 2).alias("value_sum"),
                )
                .select("user_id", F.col("s.start").alias("s_start"),
                        F.col("s.end").alias("s_end"), "n_events", "value_sum")
                .collect()
            )
        }
        assert got == want and len(got) > 0


class TestStatefulSessionize:
    def test_sessions_against_batch_window_trick(self, spark, sf_dir, batch_events):
        """The custom operator's CLOSED sessions must agree with the
        batch lag-gap sessionization on (user, start, n, sum)."""
        s = sessionize_stateful(stream_events(spark, sf_dir), gap_seconds=1800)
        run_to_memory(s, "statef_out", "append")
        got = {
            (r.user_id, r.s_start): (r.s_end, r.n_events, r.value_sum)
            for r in spark.table("statef_out").collect()
        }
        # batch oracle: classic lag/gap/cumsum sessionization
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts")
        sess = (
            batch_events.withColumn("prev", F.lag("ts").over(w))
            .withColumn(
                "new_s",
                (
                    F.col("prev").isNull()
                    | (F.col("ts").cast("long") - F.col("prev").cast("long") > 1800)
                ).cast("int"),
            )
            .withColumn("sid", F.sum("new_s").over(w))
            .groupBy("user_id", "sid")
            .agg(
                F.min("ts").alias("s_start"),
                F.max("ts").alias("s_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("value_sum"),
            )
        )
        want = {
            (r.user_id, r.s_start): (r.s_end, r.n_events, r.value_sum)
            for r in sess.collect()
        }
        # the stateful op only emits sessions closed by gap or timeout;
        # every emitted session must match the batch oracle exactly
        assert len(got) > 0
        for k, v in got.items():
            assert k in want, f"spurious session {k}"
            assert v == want[k], f"session {k}: {v} != {want[k]}"


class TestStreamingDedup:
    def test_cross_batch_dedup_matches_batch_distinct(self, spark, tmp_path):
        """Redelivered rows (same event_id, one watermark apart at
        most) must be dropped across micro-batches; the drained result
        equals batch dropDuplicates."""
        import shutil

        from cowsdb_spark.streaming import dedup_stream
        from cowsdb_spark.streaming.windows import run_to_memory

        src = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
        d = str(tmp_path / "dup_stream")
        # two identical files = two micro-batches of the same rows
        src.coalesce(1).write.parquet(d)
        part = [
            f for f in __import__("os").listdir(d) if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{d}/{part}", f"{d}/copy-{part}")

        raw = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        s = dedup_stream(raw, keys=["event_id"], watermark="10 years")
        run_to_memory(s, "dedup_out", "append")
        got = spark.table("dedup_out").count()
        want = src.dropDuplicates(["event_id"]).count()
        assert got == want > 0

    def test_state_is_keyed_not_unbounded(self, spark):
        """Plan shape: the dedup uses the watermark-evicting operator
        (dropDuplicatesWithinWatermark), not plain dropDuplicates —
        the difference between bounded and unbounded state at scale."""
        from cowsdb_spark.streaming import dedup_stream, stream_events

        s = dedup_stream(stream_events(spark, "/root/testdata/sf0.001"))
        assert "deduplicatewithinwatermark" in s._jdf.queryExecution().logical().toString().lower()


class TestStreamingJoins:
    """r6: stream-static enrichment and the watermarked stream-stream
    interval join must equal their batch equivalents on a full drain
    (streaming/joins.py)."""

    def test_stream_static_enrich_equals_batch(self, spark, sf_dir):
        from cowsdb_spark.streaming import stream_events
        from cowsdb_spark.streaming.joins import stream_static_enrich

        ev = load_table(spark, sf_dir, "events")
        dim = ev.groupBy("event_type").agg(
            F.round(F.avg("value"), 6).alias("type_avg")
        )
        s = stream_static_enrich(stream_events(spark, sf_dir), dim,
                                 "event_type")
        run_to_memory(s, "tsj_enrich", "append")
        got = (
            spark.table("tsj_enrich").groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("event_type").collect()
        )
        want = (
            ev.join(F.broadcast(dim), "event_type")
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("event_type").collect()
        )
        assert got == want and len(got) > 0

    def test_interval_join_equals_batch_range_join(self, spark, sf_dir):
        from cowsdb_spark.streaming import stream_events
        from cowsdb_spark.streaming.joins import stream_stream_interval_join

        def side(et):
            return (
                stream_events(spark, sf_dir)
                .filter(F.col("event_type") == et)
                .select("user_id", "ts", "event_id")
            )

        j = stream_stream_interval_join(
            side("purchase"), side("view"), key="user_id",
            within="10 minutes", watermark="30 minutes",
        )
        run_to_memory(j, "tsj_interval", "append")
        got = sorted(
            (r["event_id"], r["event_id_r"])
            for r in spark.table("tsj_interval").collect()
        )
        ev = load_table(spark, sf_dir, "events")
        l = ev.filter("event_type = 'purchase'").select(
            F.col("user_id"), F.col("ts").alias("lts"),
            F.col("event_id").alias("lid"))
        r = ev.filter("event_type = 'view'").select(
            F.col("user_id"), F.col("ts").alias("rts"),
            F.col("event_id").alias("rid"))
        want = sorted(
            (row["lid"], row["rid"])
            for row in l.join(r, "user_id")
            .filter("rts >= lts - INTERVAL 10 MINUTES "
                    "AND rts <= lts + INTERVAL 10 MINUTES")
            .collect()
        )
        assert got == want and len(got) > 0


class TestStreamNeardupCandidates:
    """Streaming near-dup screen vs the persisted banded signature
    store: stateless stream-static band join, candidates equal the
    batch increment's new x seen candidate stage on the same rows."""

    def test_streaming_equals_batch_candidates(self, spark, tmp_path):
        from cowsdb_spark.operators.dedup import (
            banded_keys,
            minhash_signature_table,
        )
        from cowsdb_spark.streaming.joins import stream_neardup_candidates
        from cowsdb_spark.streaming.windows import run_to_memory

        seen = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog today"),
                (101, "an entirely different stored document body here now"),
            ],
            "doc_id long, text string",
        )
        store = banded_keys(
            minhash_signature_table(seen), "doc_id", 32, 8
        )
        new = spark.createDataFrame(
            [
                # near-dup of 100 (one word changed)
                (1, "the quick brown fox jumps over the lazy cat today"),
                # unrelated
                (2, "nothing in common with anything stored whatsoever at all"),
            ],
            "doc_id long, text string",
        )
        d = str(tmp_path / "neardup_stream")
        new.coalesce(1).write.parquet(d)
        s = stream_neardup_candidates(
            spark.readStream.schema(new.schema).parquet(d), store
        )
        run_to_memory(s, "neardup_out", "append")
        got = {
            (r.doc_id, r.seen_id)
            for r in spark.table("neardup_out").collect()
        }
        want = {
            (r.doc_id, r.seen_id)
            for r in stream_neardup_candidates(new, store).collect()
        }
        assert got == want
        assert (1, 100) in got  # the planted near-dup collides
        assert all(a != 2 for a, _ in got)  # unrelated doc never does

    def test_zero_streaming_state(self, spark, tmp_path):
        # the screen must plan as a stateless stream-static join: no
        # StateStore operator in the executed streaming plan
        from cowsdb_spark.operators.dedup import (
            banded_keys,
            minhash_signature_table,
        )
        from cowsdb_spark.streaming.joins import stream_neardup_candidates
        from cowsdb_spark.streaming.windows import run_to_memory

        seen = spark.createDataFrame(
            [(100, "a b c d e f g h i j")], "doc_id long, text string"
        )
        store = banded_keys(minhash_signature_table(seen), "doc_id", 32, 8)
        new = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id long, text string"
        )
        d = str(tmp_path / "nostate_stream")
        new.coalesce(1).write.parquet(d)
        s = stream_neardup_candidates(
            spark.readStream.schema(new.schema).parquet(d), store
        )
        q = run_to_memory(s, "nostate_out", "append")
        progress = q.lastProgress
        assert progress is None or not progress.get("stateOperators")
