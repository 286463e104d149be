"""Decompose the string-key aggregation tier at 100M (VERDICT r6
item 4: cb13/cb16/cb18 persist >4x vs DuckDB under the interleaved
protocol — give the family a plan/probe note like the cb30/32/35
near-unique tier got in tools/probe_skippartial_r7.py).

The three shapes share long+string grouping keys:

  cb13  WHERE SearchPhrase<>'' GROUP BY SearchPhrase,
        COUNT(DISTINCT UserID)      (3-level distinct rewrite)
  cb16  GROUP BY UserID, SearchPhrase, COUNT(*)
  cb18  GROUP BY UserID, minute(EventTime), SearchPhrase, COUNT(*)

Variants:

  full      the production plan.
  exchange  scan -> repartition(grouping keys; for cb13 the distinct
            pair (SearchPhrase, UserID)) -> noop. The hard lower
            bound for any plan that ships every (projected) row —
            with near-unique composite keys the partial pass reduces
            little, so every candidate plan pays ~this.
  sortagg   full plan under forceApplySortAggregate (streams sorted
            runs instead of hash tables — tests whether the hash
            table, not the exchange, is the cost).

Interpretation mirrors the near-unique probe: if full/exchange is
close to 1, the family is exchange-bound on one box and the scale
lever is horizontal fan-out, not a smarter single-node plan.

Fresh JVM per cell, interleaved rounds, min-of-2 after warm-up.
Writes PROBE_STRINGAGG_100M.json.

Usage: python tools/probe_stringagg_r7.py [--cell <variant>]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("full", "exchange", "sortagg")
ROUNDS = 3
REPS = 2


def _build(spark, qid: str):
    from pyspark.sql import functions as F

    hits = spark.table("hits")
    if qid == "cb13":
        df = hits.filter("SearchPhrase <> ''").select("SearchPhrase", "UserID")
        full = (
            df.groupBy("SearchPhrase")
            .agg(F.countDistinct("UserID").alias("u"))
            .orderBy(F.desc("u"), "SearchPhrase")
            .limit(10)
        )
        floor = df.repartition(32, F.col("SearchPhrase"), F.col("UserID"))
        return full, floor
    if qid == "cb16":
        df = hits.select("UserID", "SearchPhrase")
        full = (
            df.groupBy("UserID", "SearchPhrase")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), "UserID", "SearchPhrase")
            .limit(10)
        )
        floor = df.repartition(32, F.col("UserID"), F.col("SearchPhrase"))
        return full, floor
    if qid == "cb18":
        df = hits.select(
            "UserID",
            F.minute("EventTime").alias("m"),
            "SearchPhrase",
        )
        full = (
            df.groupBy("UserID", "m", "SearchPhrase")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), "UserID", "m", "SearchPhrase")
            .limit(10)
        )
        floor = df.repartition(
            32, F.col("UserID"), F.col("m"), F.col("SearchPhrase")
        )
        return full, floor
    raise ValueError(qid)


def run_cell_inproc(variant: str) -> None:
    if variant == "sortagg":
        os.environ["MOOSPARK_EXTRA_CONF"] = (
            "spark.sql.test.forceApplySortAggregate=true"
        )
    from cowsdb_spark.session import get_spark

    spark = get_spark("probe-stringagg")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hits_100m.parquet",
    )
    spark.read.parquet(path).createOrReplaceTempView("hits")
    per = {}

    def execute(qid):
        full, floor = _build(spark, qid)
        if variant == "exchange":
            floor.write.format("noop").mode("overwrite").save()
        else:
            full.collect()

    for qid in ("cb13", "cb16", "cb18"):
        execute(qid)  # warm-up
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            execute(qid)
            best = min(best, time.perf_counter() - t0)
        per[qid] = round(best, 3)
    print("CELL_JSON " + json.dumps(per))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell_inproc(sys.argv[2])
        return
    here = os.path.abspath(__file__)
    acc: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    for r in range(ROUNDS):
        for variant in VARIANTS:
            out = subprocess.run(
                [sys.executable, here, "--cell", variant],
                capture_output=True, text=True, timeout=1800,
            )
            for line in out.stdout.splitlines():
                if line.startswith("CELL_JSON "):
                    per = json.loads(line[len("CELL_JSON "):])
                    acc[variant].append(per)
                    print(
                        f"round {r} {variant:9} total "
                        f"{round(sum(per.values()), 2):7.2f}  {per}",
                        flush=True,
                    )
                    break
            else:
                print(f"round {r} {variant}: CELL FAILED\n{out.stderr[-1500:]}")
    med = {}
    for variant, cells in acc.items():
        if cells:
            med[variant] = {
                q: round(statistics.median(c[q] for c in cells), 3)
                for q in cells[0]
            }
    result = {
        "rows": 100_000_000,
        "protocol": (
            "fresh-JVM cell per (variant, round), interleaved, min-of-2 "
            "per query after warm-up, 3 rounds, medians"
        ),
        "variants": {
            "full": "production plan",
            "exchange": "scan -> repartition(keys) -> noop: shuffle-all floor",
            "sortagg": "forceApplySortAggregate=true",
        },
        "raw_cells": {v: acc[v] for v in VARIANTS},
        "medians": med,
        "exchange_fraction": {
            q: round(med["exchange"][q] / med["full"][q], 3)
            for q in med.get("full", {})
            if med.get("exchange")
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PROBE_STRINGAGG_100M.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["medians"]))


if __name__ == "__main__":
    main()
