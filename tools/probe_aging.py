"""Session-aging probe: run the full 43-query ClickBench sweep at 10M
in ONE session (as bench's cb_10m section does) and log per-query
wall time, /dev/shm shuffle-scratch usage, and JVM heap after each
query — to locate the cross-query degradation (cb32 1.0s fresh vs
2.1s in-sweep; cb33 0.5s fresh vs 3.2s in-sweep).  Scratch tool.

Usage: python tools/probe_aging.py [k=v;k=v extra conf]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1:
    os.environ["MOOSPARK_EXTRA_CONF"] = sys.argv[1]

from cowsdb_spark.clickbench import QUERIES  # noqa: E402
from cowsdb_spark.engine import Engine  # noqa: E402
from cowsdb_spark.session import get_spark  # noqa: E402
from tools.gen_hits import ensure_hits_10m  # noqa: E402


def shm_used_mb() -> float:
    total, used, _free = shutil.disk_usage("/dev/shm")
    return used / 1e6


def main() -> None:
    spark = get_spark("probe-aging")
    spark.read.parquet(ensure_hits_10m()).createOrReplaceTempView("hits")
    eng = Engine(spark)
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
    total = 0.0
    for q in QUERIES:
        eng.execute_to_df(q["sql"])[0].collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.execute_to_df(q["sql"])[0].collect()
            best = min(best, time.perf_counter() - t0)
        total += best
        heap_mb = (rt.totalMemory() - rt.freeMemory()) / 1e6
        print(
            f"{q['id']} {best:7.3f}s shm={shm_used_mb():8.0f}MB heap={heap_mb:7.0f}MB",
            flush=True,
        )
    print(f"TOTAL {total:.3f}")


if __name__ == "__main__":
    main()
