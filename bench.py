"""Benchmark runner — the driver's per-round feedback loop.

Runs the conformance/headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_literals": sec, ...}, "sf": 0.1}

Timing protocol (BASELINE.md notes): JVM/session startup excluded;
one warm-up pass per query (parquet footer + page cache, code
paths JIT'd), then the timed pass. This mirrors ClickBench's
hot-run convention, which is what the chdb/duckdb baseline uses.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cowsdb_spark.queries import registry
from cowsdb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("moospark-bench")
    reg = registry()

    timings: dict[str, float] = {}
    for name, qd in sorted(reg.items()):
        # warm-up pass (not timed)
        qd.spark(spark, sf_dir).collect()
        t0 = time.perf_counter()
        qd.spark(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    # ClickBench sweep on the hits_sample fixture (the reference CI's
    # own benchmark shape, SURVEY §6) through the CH-dialect engine
    from cowsdb_spark.clickbench import QUERIES, register_hits
    from cowsdb_spark.engine import Engine

    eng = Engine(spark)
    register_hits(spark)
    for q in QUERIES:
        df, _, _, _ = eng.execute_to_df(q["sql"])
        df.collect()  # warm-up
        t0 = time.perf_counter()
        eng.execute_to_df(q["sql"])[0].collect()
        timings[q["id"]] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "conformance-suite warm wall-clock, Spark local",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
