"""Interleaved A/B config probe at 10M — each cell runs in a fresh
subprocess (fresh JVM, so GC flags take effect), configs interleaved
A,B,C,A,B,C..., medians over rounds.  Scratch tool.

Usage: python tools/probe_ab_10m.py            # orchestrate
       python tools/probe_ab_10m.py --cell k=v;k=v   # one cell (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = {"cb13", "cb16", "cb17", "cb18", "cb21", "cb28", "cb32", "cb35"}

CONFIGS = {
    # vecmap (r5) is now baked into session.py, so "base" includes it.
    "base": {},
    # shuffle files land on RAM-backed tmpfs (session.py): lz4 on that
    # path may be pure CPU cost with zero IO payoff
    "nocomp": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "lz4blk512": {"spark.io.compression.lz4.blockSize": "524288"},
}

ROUNDS = 3


def run_cell_inproc(conf_str: str) -> None:
    os.environ["MOOSPARK_EXTRA_CONF"] = conf_str
    from cowsdb_spark.clickbench import QUERIES
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark
    from tools.gen_hits import ensure_hits_10m

    spark = get_spark("probe-ab-cell")
    spark.read.parquet(ensure_hits_10m()).createOrReplaceTempView("hits")
    eng = Engine(spark)
    total = 0.0
    per = {}
    for q in QUERIES:
        if q["id"] not in SUBSET:
            continue
        eng.execute_to_df(q["sql"])[0].collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.execute_to_df(q["sql"])[0].collect()
            best = min(best, time.perf_counter() - t0)
        total += best
        per[q["id"]] = round(best, 3)
    print("CELL_JSON " + json.dumps(per))
    print(f"CELL_TOTAL {total:.3f}")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell_inproc(sys.argv[2])
        return
    results: dict[str, list[float]] = {k: [] for k in CONFIGS}
    for r in range(ROUNDS):
        for name, extra in CONFIGS.items():
            conf_str = ";".join(f"{k}={v}" for k, v in extra.items())
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell", conf_str],
                capture_output=True, text=True, timeout=300,
            )
            t = float("nan")
            for line in out.stdout.splitlines():
                if line.startswith("CELL_TOTAL"):
                    t = float(line.split()[1])
            results[name].append(t)
            pq = ""
            for line in out.stdout.splitlines():
                if line.startswith("CELL_JSON"):
                    pq = line[len("CELL_JSON "):]
            print(f"round {r} {name:12s} {t:7.3f}s {pq}", flush=True)
    print("--- medians ---")
    for name, ts in results.items():
        print(f"{name:12s} median={statistics.median(ts):7.3f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
