"""A/B the two aggregate-shape rewrites (plans/agg_split.py) at 100M.

cb22  DISTINCT + string-MIN/MAX: `engine` (split fires) vs `plain`
      (raw spark.sql — the pre-rewrite single SortAggregate pipeline).
cb35  derived group keys: `engine` (reduced to GROUP BY ClientIP) vs
      `plain` (raw spark.sql groups by all four key expressions).

Fresh JVM per (arm, round), arms interleaved within a round, min-of-2
after a warm-up — the protocol every r6/r7 probe uses. Also prints a
DuckDB median per query for the same box state so the ratio is
directly comparable to BENCH_100M.json.

Usage: python tools/probe_cb22_r7.py
       python tools/probe_cb22_r7.py --cell <engine|plain>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = {
    "cb22": (
        "SELECT SearchPhrase, MIN(URL) AS mu, MIN(Title) AS mt, COUNT(*) AS c, "
        "COUNT(DISTINCT UserID) AS u FROM hits WHERE Title LIKE '%the%' "
        "AND URL NOT LIKE '%.google.%' AND SearchPhrase <> '' "
        "GROUP BY SearchPhrase ORDER BY c DESC, SearchPhrase LIMIT 10"
    ),
    "cb35": (
        "SELECT ClientIP, ClientIP - 1 AS m1, ClientIP - 2 AS m2, "
        "ClientIP - 3 AS m3, COUNT(*) AS c FROM hits GROUP BY ClientIP, "
        "ClientIP - 1, ClientIP - 2, ClientIP - 3 "
        "ORDER BY c DESC, ClientIP LIMIT 10"
    ),
}

ARMS = ("engine", "plain")
ROUNDS = 3
REPS = 2

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "hits_100m.parquet",
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PROBE_AGGSPLIT_100M.json",
)


def run_cell_inproc(arm: str) -> None:
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark

    spark = get_spark("probe-aggsplit")
    spark.read.parquet(FIXTURE).createOrReplaceTempView("hits")
    eng = Engine(spark)

    def execute(sql):
        if arm == "engine":
            eng.execute_to_df(sql)[0].collect()
        else:
            spark.sql(sql).collect()

    per = {}
    for qid, sql in QUERIES.items():
        execute(sql)  # warm-up
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            execute(sql)
            best = min(best, time.perf_counter() - t0)
        per[qid] = round(best, 3)
    print("CELL_JSON " + json.dumps(per))


def duck_medians() -> dict:
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute(
        f"CREATE VIEW hits AS SELECT * FROM read_parquet('{FIXTURE}')"
    )
    per = {}
    for qid, sql in QUERIES.items():
        con.execute(sql).fetchall()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        per[qid] = round(statistics.median(ts), 3)
    return per


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell_inproc(sys.argv[2])
        return
    here = os.path.abspath(__file__)
    acc: dict[str, list[dict]] = {a: [] for a in ARMS}
    for r in range(ROUNDS):
        for arm in ARMS:
            out = subprocess.run(
                [sys.executable, here, "--cell", arm],
                capture_output=True, text=True, timeout=1800,
            )
            for line in out.stdout.splitlines():
                if line.startswith("CELL_JSON "):
                    per = json.loads(line[len("CELL_JSON "):])
                    acc[arm].append(per)
                    print(f"round {r} {arm:7} {per}", flush=True)
                    break
            else:
                print(f"round {r} {arm}: CELL FAILED\n{out.stdout[-2000:]}"
                      f"\n{out.stderr[-2000:]}", flush=True)
    med = {
        a: {q: round(statistics.median([c[q] for c in cells]), 3)
            for q in QUERIES}
        for a, cells in acc.items() if cells
    }
    duck = duck_medians()
    result = {
        "rows": 100_000_000,
        "protocol": f"fresh JVM per (arm, round), arms interleaved, "
                    f"min-of-{REPS} after warm-up, {ROUNDS} rounds, medians; "
                    f"DuckDB median-of-3 same box state",
        "raw_cells": acc,
        "medians": med,
        "duckdb": duck,
        "ratio_engine": {
            q: round(med["engine"][q] / duck[q], 2) for q in QUERIES
        } if "engine" in med else None,
        "ratio_plain": {
            q: round(med["plain"][q] / duck[q], 2) for q in QUERIES
        } if "plain" in med else None,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("medians", "duckdb", "ratio_engine", "ratio_plain")}))


if __name__ == "__main__":
    main()
