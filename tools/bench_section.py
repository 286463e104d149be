"""One bench section in a fresh process (fresh JVM) — invoked by
bench.py as a subprocess.

Round-4 postmortem (VERDICT r4 "What's wrong" #1-2): the monolithic
bench ran conformance + 100k ClickBench + 10M ClickBench in ONE
SparkSession, and late sections inherited an aged JVM — the committed
cb34 read 3.15 s where a fresh session measures 0.54 s, and the sf0.1
"shared-query regression" (23->37 s) reproduced only in the aged
session.  ClickBench's own convention is one system at a time in a
clean process; each section now gets exactly that, so artifacts are
reproducible instead of hostage to in-session history.

Usage: python tools/bench_section.py <conformance|cb_sample|cb_10m>
Prints one JSON line on stdout; diagnostics to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min_of(reps: int, fn) -> float:
    fn()  # warm-up: parquet footers + page cache + codegen JIT'd
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def section_conformance(out: dict) -> None:
    from cowsdb_spark.queries import registry
    from cowsdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("moospark-bench-conf")
    timings: dict[str, float] = {}
    for name, qd in sorted(registry().items()):
        try:
            timings[name] = round(
                _min_of(1, lambda qd=qd: qd.spark(spark, sf_dir).collect()), 3
            )
        except Exception as e:  # noqa: BLE001
            out.setdefault("errs", {})[name] = repr(e)[:300]
            traceback.print_exc(file=sys.stderr)
    out["queries"] = timings


def section_cb_sample(out: dict) -> None:
    from cowsdb_spark.clickbench import QUERIES, register_hits
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark

    spark = get_spark("moospark-bench-cb")
    register_hits(spark)
    eng = Engine(spark)
    cb: dict[str, float] = {}
    for q in QUERIES:
        try:
            cb[q["id"]] = round(
                _min_of(1, lambda q=q: eng.execute_to_df(q["sql"])[0].collect()), 3
            )
        except Exception as e:  # noqa: BLE001
            out.setdefault("errs", {})[q["id"]] = repr(e)[:300]
    out["queries"] = cb


def section_cb_10m(out: dict) -> None:
    import duckdb

    from cowsdb_spark.clickbench import QUERIES
    from cowsdb_spark.engine import Engine
    from cowsdb_spark.session import get_spark
    from tools.gen_hits import ensure_hits_10m

    p10 = ensure_hits_10m()
    spark = get_spark("moospark-bench-10m")
    spark.read.parquet(p10).createOrReplaceTempView("hits")
    eng = Engine(spark)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    con.execute(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{p10}')")
    # r7 protocol (mirrors tools/bench_100m.py): engines interleaved
    # PER QUERY so box state is identical for both sides of a ratio,
    # plus a deterministic full GC before each Spark cell — the 45s
    # periodicGC timer fires at arbitrary cell phases and late-sweep
    # heavy aggs otherwise inherit the whole sweep's garbage.
    jvm_gc = spark.sparkContext._jvm.System.gc
    cbs: dict[str, float] = {}
    cbd: dict[str, float] = {}
    for q in QUERIES:
        try:
            jvm_gc()
            cbs[q["id"]] = round(
                _min_of(3, lambda q=q: eng.execute_to_df(q["sql"])[0].collect()), 3
            )
        except Exception as e:  # noqa: BLE001
            out.setdefault("errs", {})[f"10m_{q['id']}"] = repr(e)[:300]
        try:
            dsql = q.get("oracle", q["sql"])
            cbd[q["id"]] = round(_min_of(3, lambda d=dsql: con.execute(d).fetchall()), 3)
        except Exception as e:  # noqa: BLE001
            out.setdefault("errs", {})[f"10m_ddb_{q['id']}"] = repr(e)[:300]
    spark.stop()
    out["spark"] = cbs
    out["duckdb"] = cbd
    out["protocol"] = "interleaved per-query, min-of-3 after warm-up, pre-cell GC"
    out["spark_total"] = round(sum(cbs.values()), 3)
    out["duckdb_total"] = round(sum(cbd.values()), 3)


def main() -> None:
    which = sys.argv[1]
    out: dict = {"section": which}
    try:
        {"conformance": section_conformance,
         "cb_sample": section_cb_sample,
         "cb_10m": section_cb_10m}[which](out)
    except Exception as e:  # noqa: BLE001 — always emit a JSON line
        out.setdefault("errs", {})["section"] = repr(e)[:300]
        traceback.print_exc(file=sys.stderr)
    sys.stdout.flush()
    print("SECTION_JSON " + json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
