"""Decompose the near-unique-key aggregation cost at 100M (VERDICT r6
item 2: "skip the partial-agg pass when key NDV ~ rows").

OSS Spark 4.1.2 has NO skip-partial-agg conf (SQLConf greps: nothing;
AggUtils always plans partial+final), so this probe measures what the
skip COULD save by decomposing the plan:

  full        the production plan: scan -> partial agg -> exchange ->
              final agg -> top-k.
  exchange    scan -> repartition(keys) -> noop sink. No aggregation at
              all: a HARD LOWER BOUND for any plan that must shuffle
              every row (at NDV~rows the partial pass reduces nothing,
              so every candidate plan ships ~all rows).
  repart_agg  scan -> repartition(keys) -> groupBy -> top-k. Catalyst
              stacks partial+final post-shuffle with no second
              exchange — the partial pass runs on colocated data; the
              delta vs `exchange` isolates (partial + final) agg cost.
  sortagg     the production plan under
              spark.sql.test.forceApplySortAggregate=true (streams
              sorted runs instead of hash tables).

If full - exchange is small, the family is exchange-bound and no agg
trick (including a true partial skip) can close the DuckDB gap on one
box — the honest scale lever is horizontal fan-out of the exchange.

Fresh JVM per cell, interleaved rounds. Scratch tool.

Usage: python tools/probe_skippartial_r7.py
       python tools/probe_skippartial_r7.py --cell <variant>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the three weak-set queries, as (id, keys, aggs) — aggs rebuilt with
# the DataFrame API so the repartition variants can be expressed
SHAPES = {
    "cb30": {
        "filter": "SearchPhrase <> ''",
        "keys": ["SearchEngineID", "ClientIP"],
    },
    "cb32": {"filter": None, "keys": ["WatchID", "ClientIP"]},
    "cb35": {"filter": None, "keys": ["ClientIP"]},
}

VARIANTS = ("full", "exchange", "repart_agg", "sortagg")
ROUNDS = 3
REPS = 2


def _build(spark, qid, variant):
    from pyspark.sql import functions as F

    shape = SHAPES[qid]
    df = spark.table("hits")
    if shape["filter"]:
        df = df.filter(shape["filter"])
    keys = [F.col(k) for k in shape["keys"]]
    cols = shape["keys"] + ["IsRefresh", "ResolutionWidth"]
    df = df.select(*cols)
    if variant == "exchange":
        return ("noop", df.repartition(32, *keys))
    if variant == "repart_agg":
        df = df.repartition(32, *keys)
    agg = (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("IsRefresh").alias("r"),
            F.round(F.avg("ResolutionWidth"), 4).alias("a"),
        )
        .orderBy(F.desc("c"), *[F.col(k) for k in shape["keys"]])
        .limit(10)
    )
    return ("collect", agg)


def run_cell_inproc(variant: str) -> None:
    if variant == "sortagg":
        os.environ["MOOSPARK_EXTRA_CONF"] = (
            "spark.sql.test.forceApplySortAggregate=true"
        )
    from cowsdb_spark.session import get_spark

    spark = get_spark("probe-skippartial")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hits_100m.parquet",
    )
    spark.read.parquet(path).createOrReplaceTempView("hits")
    per = {}
    inner = "sortagg" if variant == "sortagg" else variant

    def execute(qid):
        kind, df = _build(spark, qid, "full" if inner == "sortagg" else inner)
        if kind == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    for qid in SHAPES:
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
                    print(f"round {r} {variant:10} total "
                          f"{round(sum(per.values()), 2):7.2f}  {per}",
                          flush=True)
                    break
            else:
                print(f"round {r} {variant}: CELL FAILED\n{out.stderr[-1500:]}")
    print("\n=== medians per variant ===")
    for variant, cells in acc.items():
        if not cells:
            continue
        med = {
            q: round(statistics.median(c[q] for c in cells), 3)
            for q in cells[0]
        }
        print(f"{variant:10} total {round(sum(med.values()), 2):7.2f}  {med}")


if __name__ == "__main__":
    main()
