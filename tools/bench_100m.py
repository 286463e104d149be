"""100M-row ClickBench point → BENCH_100M.json.

Purpose: the amortization argument made measurable. At sf0.1 and even
10M rows, Spark's ~0.1-0.3 s per-query floor (task scheduling, codegen
dispatch, 32-way setup) dominates sub-second queries and the
Spark/DuckDB ratio mostly measures that floor. At 100M rows (~5.9 GB
parquet, 10 sorted runs of 256k-row groups) per-query work is 10x and
the floor is ~2% of runtime, so the ratio reflects what survives a
1000-executor scale-up: per-row efficiency, shuffle discipline,
pushdown.

Protocol (same as BENCH_10M.json): warm session, min-of-3 after one
warm-up pass, both engines on the identical parquet file, DuckDB at
the same thread count. Run on an idle box.

Usage: python tools/bench_100m.py [spark|duck|both]   (default both)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_100M.json")


def run_spark(path: str) -> dict:
    from cowsdb_spark.clickbench import QUERIES
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark

    spark = get_spark("bench-100m")
    spark.read.parquet(path).createOrReplaceTempView("hits")
    eng = Engine(spark)
    per = {}
    for q in QUERIES:
        eng.execute_to_df(q["sql"])[0].collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.execute_to_df(q["sql"])[0].collect()
            best = min(best, time.perf_counter() - t0)
        per[q["id"]] = round(best, 3)
        print(f"spark {q['id']} {best:.3f}s", flush=True)
    spark.stop()
    return per


def run_duck(path: str) -> dict:
    import duckdb

    from cowsdb_spark.clickbench import QUERIES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{path}')")
    per = {}
    for q in QUERIES:
        dsql = q.get("oracle", q["sql"])
        con.execute(dsql).fetchall()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(dsql).fetchall()
            best = min(best, time.perf_counter() - t0)
        per[q["id"]] = round(best, 3)
        print(f"duck  {q['id']} {best:.3f}s", flush=True)
    return per


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from tools.gen_hits import ensure_hits_100m

    t0 = time.time()
    path = ensure_hits_100m()
    print(f"fixture ready in {time.time()-t0:.0f}s: {path} "
          f"({os.path.getsize(path)/1e9:.2f} GB)", flush=True)

    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    doc["rows"] = 100_000_000
    if which in ("spark", "both"):
        doc["spark"] = run_spark(path)
        doc["spark_total"] = round(sum(doc["spark"].values()), 3)
    if which in ("duck", "both"):
        doc["duckdb"] = run_duck(path)
        doc["duckdb_total"] = round(sum(doc["duckdb"].values()), 3)
    if "spark_total" in doc and "duckdb_total" in doc:
        doc["ratio"] = round(doc["spark_total"] / doc["duckdb_total"], 2)
    doc["protocol"] = ("warm-session min-of-3 after one warm-up pass, "
                       "identical parquet, DuckDB at same thread count")
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in doc.items() if not isinstance(v, dict)}))


if __name__ == "__main__":
    main()
