"""Measure the DuckDB oracle-engine baseline for BASELINE.md §B.

Runs every ``oracle_sql()`` conformance query plus the ClickBench
sweep in DuckDB at the given sf dir (same warm-run protocol as
bench.py: one warm-up pass, one timed pass), and prints a summary
to paste into BASELINE.md. DuckDB stands in for the measured
single-node columnar baseline (the reference's own engine — chDB —
is not installed in this container; both are state-of-the-art
vectorized single-node engines, which is the 2x-gate comparison
BASELINE.json intends).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from cowsdb_spark.catalog import TABLES
from cowsdb_spark.clickbench import QUERIES as CB
from tools.gen_hits import ensure_hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    con.execute(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{ensure_hits()}')")

    # Oracles that are correctness artifacts, not performance
    # baselines: t30's WITH RECURSIVE transitive closure materializes
    # every (node, reachable-label) pair — quadratic on chain graphs,
    # >5 min at sf0.1 where the Spark operator (pointer jumping)
    # takes ~5 s. The driver's correctness gate runs it at sf0.01.
    skip_slow = {"t30_dedup_clusters", "t37_dedup_keep_one"}

    timings: dict[str, float] = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        if name in skip_slow:
            continue
        try:
            con.execute(sql).fetchall()  # warm
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:
            timings[name] = -1.0
            print(f"# {name} failed: {str(e)[:80]}", file=sys.stderr)
    for q in CB:
        sql = q.get("oracle", q["sql"])
        con.execute(sql).fetchall()
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[q["id"]] = round(time.perf_counter() - t0, 4)

    total = round(sum(v for v in timings.values() if v > 0), 4)
    print(json.dumps({"metric": "duckdb-baseline warm wall-clock", "value": total,
                      "unit": "sec", "queries": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
