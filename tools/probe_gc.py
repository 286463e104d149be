"""A/B driver-JVM GC settings on the variance-prone 10M ClickBench
subset. Scratch tool: run one config per fresh process —
    MOOSPARK_EXTRA_CONF="spark.driver.extraJavaOptions=-XX:+UseParallelGC" \
        python tools/probe_gc.py
prints per-query [min, median, max] over N reps plus total GC time.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cowsdb_spark.clickbench import QUERIES  # noqa: E402
from cowsdb_spark.engine import Engine  # noqa: E402
from cowsdb_spark.session import get_spark  # noqa: E402
from tools.gen_hits import ensure_hits_10m  # noqa: E402

SUBSET = ("cb23", "cb28", "cb32", "cb33", "cb35", "cb16", "cb18", "cb13")
REPS = int(os.environ.get("PROBE_REPS", "7"))


def main():
    spark = get_spark("probe-gc")
    spark.sparkContext.setLogLevel("ERROR")
    p10 = ensure_hits_10m()
    spark.read.parquet(p10).createOrReplaceTempView("hits")
    eng = Engine(spark)
    q = {x["id"]: x["sql"] for x in QUERIES}
    out = {}
    for qid in SUBSET:
        eng.execute_to_df(q[qid])[0].collect()
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            eng.execute_to_df(q[qid])[0].collect()
            ts.append(time.perf_counter() - t0)
        out[qid] = [round(min(ts), 3), round(statistics.median(ts), 3), round(max(ts), 3)]
    # total executor GC time (local mode: one JVM)
    try:
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        gc_ms = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
    except Exception:  # noqa: BLE001
        gc_ms = -1
    print(json.dumps({"conf": os.environ.get("MOOSPARK_EXTRA_CONF", ""),
                      "per_query_min_med_max": out,
                      "median_total": round(sum(v[1] for v in out.values()), 3),
                      "gc_ms": gc_ms}))


if __name__ == "__main__":
    main()
