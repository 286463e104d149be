"""Composite-operator scale point at 10M rows → BENCH_COMPOSITE_10M.json
(VERDICT r5 #8): the conformance operators that aren't ClickBench
shapes — ASOF join (backward/forward/nearest), the q16 ranked-window
composite, and the q28 set-op family — measured above the scheduling
floor, with per-query wall time and shuffle bytes so super-linear
stages are visible.

Data: synthetic 10M-row "orders" (user, ts, price) and two asof sides
(10M events left, 1M quotes right, 100k keys) built once as parquet
fixtures via spark.range — no Python row generation.

Usage: python tools/bench_composite_scale.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def _shuffle_totals(spark):
    try:
        store = spark._jsparkSession.sparkContext().statusStore()  # noqa: SLF001
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        gw = spark.sparkContext._gateway  # noqa: SLF001
        it = store.stageList(
            None, False, False,
            gw.new_array(gw.jvm.double, 0), jvm.java.util.ArrayList(),
        ).iterator()
        rd = wr = 0
        while it.hasNext():
            s = it.next()
            rd += s.shuffleReadBytes()
            wr += s.shuffleWriteBytes()
        return rd, wr
    except Exception:  # noqa: BLE001
        return -1, -1


def ensure_fixtures(spark, n: int):
    """events: n rows (key, ts, v); quotes: n/10 rows (key, ts, px);
    orders: n rows (user, okey, price, d). Deterministic, seedless
    (pure arithmetic of the row id)."""
    ev = os.path.join(FIXDIR, f"comp_events_{n}.parquet")
    qt = os.path.join(FIXDIR, f"comp_quotes_{n}.parquet")
    od = os.path.join(FIXDIR, f"comp_orders_{n}.parquet")
    if not os.path.exists(ev):
        (spark.range(n).select(
            (F.col("id") % 100_000).alias("key"),
            ((F.col("id") * 7919) % 86_400_000).alias("ts"),
            (F.col("id") % 997).cast("double").alias("v"),
        ).write.mode("overwrite").parquet(ev))
    if not os.path.exists(qt):
        (spark.range(n // 10).select(
            (F.col("id") % 100_000).alias("key"),
            ((F.col("id") * 104729) % 86_400_000).alias("ts"),
            ((F.col("id") % 9973) / 100.0).alias("px"),
        ).write.mode("overwrite").parquet(qt))
    if not os.path.exists(od):
        (spark.range(n).select(
            (F.col("id") % 1_000_000).alias("user"),
            F.col("id").alias("okey"),
            ((F.col("id") * 31) % 200_000 / 1.7).alias("price"),
            (F.col("id") % 37).alias("d"),
        ).write.mode("overwrite").parquet(od))
    return (
        spark.read.parquet(ev),
        spark.read.parquet(qt),
        spark.read.parquet(od),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from cowsdb_spark.operators.asof import asof_join
    from cowsdb_spark.session import get_spark

    spark = get_spark("composite-scale")
    events, quotes, orders = ensure_fixtures(spark, n)

    def q16_shape():
        w = W.partitionBy("user").orderBy(F.desc("price"), "okey")
        wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        return (
            orders.select(
                "user", "okey",
                F.row_number().over(w).alias("rn"),
                F.lag("price").over(w).alias("prev_p"),
                F.lead("price").over(w).alias("next_p"),
                F.sum("price").over(wrun).alias("run"),
            )
            .filter(F.col("rn") <= 3)
        )

    def q28_shape():
        a = events.select((F.col("key") % 50_000).alias("x"))
        b = quotes.select("key").select((F.col("key") % 60_000).alias("x"))
        return (
            a.union(b).distinct().agg(F.count("*").alias("c"))
            .unionByName(
                a.intersect(b).agg(F.count("*").alias("c")))
            .unionByName(
                a.distinct().exceptAll(b.distinct()).distinct()
                .agg(F.count("*").alias("c")))
        )

    cases = {
        "asof_backward_10m": lambda: asof_join(
            events, quotes, on="key", direction="backward"),
        "asof_forward_10m": lambda: asof_join(
            events, quotes, on="key", direction="forward"),
        "asof_nearest_10m": lambda: asof_join(
            events, quotes, on="key", direction="nearest"),
        "window_rank_composite_10m": q16_shape,
        "setops_family_10m": q28_shape,
    }

    def consume(df):
        """Force every output column (a bare count() lets Catalyst
        prune the window/join work entirely): one xxhash64 over all
        columns, summed — full compute, O(1) driver data."""
        agg = df.select(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.xxhash64(*df.columns)).alias("h"),
        ).collect()[0]
        return agg["c"]

    out: dict = {"n_rows": n, "queries": {}}
    for name, fn in cases.items():
        consume(fn())  # warm
        best = float("inf")
        r0, w0 = _shuffle_totals(spark)
        for _ in range(3):
            t0 = time.perf_counter()
            rows = consume(fn())
            best = min(best, time.perf_counter() - t0)
        r1, w1 = _shuffle_totals(spark)
        out["queries"][name] = {
            "wall_s": round(best, 2),
            "rows_out": rows,
            "shuffle_write_mb_3runs": (
                round((w1 - w0) / 1e6, 1) if w0 >= 0 else None
            ),
        }
        print(name, out["queries"][name], flush=True)
    out["total_s"] = round(
        sum(q["wall_s"] for q in out["queries"].values()), 2
    )
    dest = os.path.join(
        os.path.dirname(FIXDIR), "..",
        f"BENCH_COMPOSITE_{n // 1_000_000}M.json",
    )
    with open(os.path.abspath(dest), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
