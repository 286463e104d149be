"""Fresh-JVM A/B probe at 100M: memory levers for the near-unique-key
aggregation family (VERDICT r6 item 2 — cb30/cb32/cb35 plus cb04 as a
COUNT(DISTINCT) control).

Hypothesis under test: at NDV~rows the partial-agg hash maps provide
zero reduction but still build multi-GB BytesToBytesMap state in a 12g
heap, so the cost is allocator/GC/spill, not hashing per se. Levers:
  - offheap24: move Tungsten pages off-heap (24g), shrinking GC load.
  - twolevel_off: drop the always-missing fast map probe entirely.
  - combined.
Skip-partial-agg itself has no OSS conf (checked SQLConf of Spark
4.1.2 — nothing matches partial/skip for aggregates), so memory cost
of the useless partial pass is the attackable component.

Each cell is a subprocess (fresh JVM); cells interleave across rounds
so box drift doesn't bias a cell. Scratch tool; results go in the
commit message / BENCH notes.

Usage: python tools/probe_memlever_r7.py            # orchestrate
       python tools/probe_memlever_r7.py --cell k=v;k=v
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = ("cb04", "cb30", "cb32", "cb35")

CONFIGS = {
    "base": {},
    "offheap24": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
    },
    "twolevel_off": {
        "spark.sql.codegen.aggregate.map.twolevel.enabled": "false",
    },
    "oh24_tl_off": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "24g",
        "spark.sql.codegen.aggregate.map.twolevel.enabled": "false",
    },
}

ROUNDS = 3
REPS = 2  # per query inside a cell (min taken), after 1 warmup


def run_cell_inproc(conf_str: str) -> None:
    os.environ["MOOSPARK_EXTRA_CONF"] = conf_str
    from cowsdb_spark.clickbench import QUERIES
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark

    spark = get_spark("probe-memlever")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hits_100m.parquet",
    )
    spark.read.parquet(path).createOrReplaceTempView("hits")
    eng = Engine(spark)
    per = {}
    for q in QUERIES:
        if q["id"] not in SUBSET:
            continue
        eng.execute_to_df(q["sql"])[0].collect()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            eng.execute_to_df(q["sql"])[0].collect()
            best = min(best, time.perf_counter() - t0)
        per[q["id"]] = round(best, 3)
    print("CELL_JSON " + json.dumps(per))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell_inproc(sys.argv[2])
        return
    here = os.path.abspath(__file__)
    acc: dict[str, list[dict]] = {k: [] for k in CONFIGS}
    for r in range(ROUNDS):
        for name, conf in CONFIGS.items():
            conf_str = ";".join(f"{k}={v}" for k, v in conf.items())
            out = subprocess.run(
                [sys.executable, here, "--cell", conf_str],
                capture_output=True, text=True, timeout=1800,
            )
            for line in out.stdout.splitlines():
                if line.startswith("CELL_JSON "):
                    per = json.loads(line[len("CELL_JSON "):])
                    acc[name].append(per)
                    tot = round(sum(per.values()), 2)
                    print(f"round {r} {name:12} total {tot:8.2f}  {per}",
                          flush=True)
                    break
            else:
                print(f"round {r} {name}: CELL FAILED\n{out.stderr[-2000:]}")
    print("\n=== medians per cell ===")
    for name, cells in acc.items():
        if not cells:
            continue
        med = {
            q: round(statistics.median(c[q] for c in cells), 3)
            for q in cells[0]
        }
        print(f"{name:12} total {round(sum(med.values()), 2):8.2f}  {med}")


if __name__ == "__main__":
    main()
