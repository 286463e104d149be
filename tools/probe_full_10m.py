"""Full 43-query ClickBench sweep at 10M, fresh session, engine path,
min-of-3 — mirrors bench.py's 10M section without the preceding
conformance + 100k sections, to isolate session-degradation effects.
Also runs the DuckDB side for ratios.  Scratch tool."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cowsdb_spark.clickbench import QUERIES  # noqa: E402
from cowsdb_spark.engine import Engine  # noqa: E402
from cowsdb_spark.session import get_spark  # noqa: E402
from tools.gen_hits import ensure_hits_10m  # noqa: E402


def main():
    spark = get_spark("probe10m-full")
    p10 = ensure_hits_10m()
    spark.read.parquet(p10).createOrReplaceTempView("hits")
    eng = Engine(spark)
    cbs = {}
    for q in QUERIES:
        eng.execute_to_df(q["sql"])[0].collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.execute_to_df(q["sql"])[0].collect()
            best = min(best, time.perf_counter() - t0)
        cbs[q["id"]] = round(best, 3)
    print(json.dumps(cbs))
    print("spark_total", round(sum(cbs.values()), 3))

    if "duck" in sys.argv[1:]:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        con.execute(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{p10}')")
        cbd = {}
        for q in QUERIES:
            dsql = q.get("oracle", q["sql"])
            con.execute(dsql).fetchall()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(dsql).fetchall()
                best = min(best, time.perf_counter() - t0)
            cbd[q["id"]] = round(best, 3)
        print(json.dumps(cbd))
        print("duckdb_total", round(sum(cbd.values()), 3))


if __name__ == "__main__":
    main()
