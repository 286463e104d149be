"""HLL sketch rollups: the merge identity (union of fine sketches ==
direct coarse sketch, exactly — same deterministic hash stream), the
accuracy envelope vs exact COUNT(DISTINCT), and the plan shape
(partial sketch aggregation before the exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark, n=20000):
    # deterministic: user u{i%2500} active on day d{i%7}, lang by %3
    return spark.range(n).select(
        F.concat(F.lit("d"), (F.col("id") % 7).cast("string")).alias("day"),
        F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
        F.concat(F.lit("u"), (F.col("id") % 2500).cast("string")).alias(
            "user"
        ),
    )


class TestHllRollup:
    def test_merge_agrees_with_direct_sketch_inside_envelope(self, spark):
        # a union is NOT bit-identical to sketching the raw input (the
        # union gadget may change internal representation) but must
        # stay inside the same error envelope as the direct sketch
        from cowsdb_spark.operators.sketches import hll_presketch, hll_rollup

        df = _corpus(spark)
        fine = hll_presketch(df, ["day", "lang"], "user")
        via_merge = {
            r.lang: r.approx_distinct
            for r in hll_rollup(fine, ["lang"]).collect()
        }
        direct = {
            r.lang: r.approx_distinct
            for r in hll_rollup(
                hll_presketch(df, ["lang"], "user"), ["lang"]
            ).collect()
        }
        for k in direct:
            assert abs(via_merge[k] - direct[k]) / direct[k] < 0.02

    def test_repeatable_and_partitioning_stays_in_envelope(self, spark):
        # a FIXED plan repeats exactly (no RNG); re-partitioning may
        # move estimates a few registers' worth (HLL_4 sparse->dense
        # promotion is partial-aggregate-local) but stays inside the
        # envelope
        from cowsdb_spark.operators.sketches import hll_presketch, hll_rollup

        df = _corpus(spark)

        def run(frame):
            return {
                r.day: r.approx_distinct
                for r in hll_rollup(
                    hll_presketch(frame, ["day"], "user"), ["day"]
                ).collect()
            }

        base = run(df)
        assert run(df) == base  # exact repeat, same plan
        for nparts in (1, 13):
            rep = run(df.repartition(nparts))
            for k, v in base.items():
                assert abs(rep[k] - v) / v < 0.02

    def test_grand_total_from_sketches(self, spark):
        from cowsdb_spark.operators.sketches import hll_presketch, hll_rollup

        df = _corpus(spark)
        fine = hll_presketch(df, ["day", "lang"], "user")
        (row,) = hll_rollup(fine, []).collect()
        exact = df.select("user").distinct().count()
        assert abs(row.approx_distinct - exact) / exact < 0.05

    def test_estimates_within_hll_envelope(self, spark):
        from cowsdb_spark.operators.sketches import hll_presketch, hll_rollup

        df = _corpus(spark)
        est = {
            r.lang: r.approx_distinct
            for r in hll_rollup(
                hll_presketch(df, ["day", "lang"], "user"), ["lang"]
            ).collect()
        }
        exact = {
            r.lang: r.c
            for r in df.groupBy("lang")
            .agg(F.countDistinct("user").alias("c"))
            .collect()
        }
        for k, e in exact.items():
            assert abs(est[k] - e) / e < 0.05, (k, est[k], e)

    def test_presketch_partial_aggregates_before_exchange(self, spark):
        from cowsdb_spark.operators.sketches import hll_presketch

        df = _corpus(spark)
        plan = (
            hll_presketch(df, ["day"], "user")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # ObjectHashAggregate partial (sketch build) must appear below
        # the exchange: raw values never shuffle, states do
        assert plan.count("ObjectHashAggregate") >= 2

    def test_sketch_table_is_tiny_and_reusable(self, spark):
        from cowsdb_spark.operators.sketches import (
            hll_estimate,
            hll_presketch,
        )

        df = _corpus(spark)
        fine = hll_presketch(df, ["day"], "user").collect()
        assert len(fine) == 7
        assert all(len(r.sketch) < 12000 for r in fine)  # ~2^12 regs
        back = spark.createDataFrame(fine)
        ests = hll_estimate(back).collect()
        assert all(r.approx_distinct > 0 for r in ests)
