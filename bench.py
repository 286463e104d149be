"""Benchmark runner — the driver's per-round feedback loop.

Runs the conformance/headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE compact JSON line as the FINAL stdout line::

    {"metric":"...","value":<total sec>,"unit":"sec",
     "queries":{"q01_literals":sec,...},"sf":0.1}

The driver stores only the last ~2000 chars of stdout and parses the
tail, so the final line must stay well under that budget: the
43-query ClickBench sweep is therefore folded into one ``cb_total``
entry on stdout, with the per-query breakdown on stderr (and the
assertion below guards the length).

Crash policy (VERDICT r2 #3): every query and every sweep section is
individually isolated — a failing query records an ``errs`` entry and
the run continues; the final JSON line prints NO MATTER WHAT. A bench
artifact must never be hostage to one query.

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
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    timings: dict[str, float] = {}
    errs: dict[str, str] = {}
    hits_10m: dict | None = None

    def timed(name: str, fn) -> None:
        """Warm pass + timed pass; failure records errs[name], never raises."""
        try:
            fn()  # warm-up (not timed)
            t0 = time.perf_counter()
            fn()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — bench must keep going
            errs[name] = repr(e)[:300]
            traceback.print_exc(file=sys.stderr)

    try:
        from cowsdb_spark.queries import registry
        from cowsdb_spark.session import get_spark

        spark = get_spark("moospark-bench")
        reg = registry()
        for name, qd in sorted(reg.items()):
            timed(name, lambda qd=qd: qd.spark(spark, sf_dir).collect())

        # ClickBench sweep on the hits_sample fixture (the reference CI's
        # own benchmark shape, SURVEY §6) through the CH-dialect engine.
        # Per-query numbers go to stderr; stdout gets one cb_total entry
        # so the final JSON line fits the driver's 2000-char tail buffer.
        try:
            from cowsdb_spark.clickbench import QUERIES, register_hits
            from cowsdb_spark.engine import Engine

            eng = Engine(spark)
            register_hits(spark)
            cb: dict[str, float] = {}
            for q in QUERIES:
                try:
                    eng.execute_to_df(q["sql"])[0].collect()  # warm-up
                    t0 = time.perf_counter()
                    eng.execute_to_df(q["sql"])[0].collect()
                    cb[q["id"]] = round(time.perf_counter() - t0, 3)
                except Exception as e:  # noqa: BLE001
                    errs[f"cb_{q['id']}"] = repr(e)[:300]
            timings["cb_total"] = round(sum(cb.values()), 3)
            print(
                json.dumps({"clickbench_detail": cb}, separators=(",", ":")),
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            errs["cb_setup"] = repr(e)[:300]
            traceback.print_exc(file=sys.stderr)

        # Scale-up point (VERDICT r2 #5): the same 43 queries at 10M rows
        # (1M sat below Spark's scheduling floor), ours vs DuckDB on the
        # same file. Kept OUT of `timings`/`value` so the headline total
        # stays round-over-round comparable (r1 definition: conformance+cb).
        try:
            import duckdb

            from tools.gen_hits import ensure_hits_10m

            p10 = ensure_hits_10m()
            spark.read.parquet(p10).createOrReplaceTempView("hits")
            # replacing the `hits` temp view bypasses the engine's
            # DDL-keyed plan-cache invalidation (the documented temp
            # view limit) — a fresh Engine guarantees the 10M sweep
            # plans against the 10M view, not the cached 100k sample
            eng = Engine(spark)
            con = duckdb.connect()
            con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
            con.execute(f"CREATE VIEW hits AS SELECT * FROM read_parquet('{p10}')")
            # each engine runs its whole sweep hot (ClickBench
            # convention: systems measured separately, not interleaved
            # — interleaving thrashes the page/dictionary caches of
            # both and inflated ratios by ~1.5x in round 3 testing)
            # ClickBench convention: hot time = min of 3 runs after a
            # warm-up (r3's closing artifact was a single contended
            # pass — cb32 read 13.5s vs a 1.1-1.9s steady state; min-of-3
            # makes the artifact robust to transient box load)
            cbs: dict[str, float] = {}
            cbd: dict[str, float] = {}
            for q in QUERIES:
                try:
                    eng.execute_to_df(q["sql"])[0].collect()  # warm-up
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        eng.execute_to_df(q["sql"])[0].collect()
                        best = min(best, time.perf_counter() - t0)
                    cbs[q["id"]] = round(best, 3)
                except Exception as e:  # noqa: BLE001
                    errs[f"10m_{q['id']}"] = repr(e)[:300]
            for q in QUERIES:
                try:
                    dsql = q.get("oracle", q["sql"])
                    con.execute(dsql).fetchall()  # warm-up
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        con.execute(dsql).fetchall()
                        best = min(best, time.perf_counter() - t0)
                    cbd[q["id"]] = round(best, 3)
                except Exception as e:  # noqa: BLE001
                    errs[f"10m_ddb_{q['id']}"] = repr(e)[:300]
            hits_10m = {
                "rows": 10_000_000,
                "spark": round(sum(cbs.values()), 3),
                "duckdb": round(sum(cbd.values()), 3),
            }
            detail = {
                "rows": 10_000_000,
                "spark_total": hits_10m["spark"],
                "duckdb_total": hits_10m["duckdb"],
                "spark": cbs,
                "duckdb": cbd,
                "ratio_spark_over_duckdb": {
                    k: round(cbs[k] / max(cbd.get(k, 0), 1e-9), 2) for k in cbs
                },
            }
            print(
                json.dumps({"hits_10m_detail": detail}, separators=(",", ":")),
                file=sys.stderr,
            )
            try:
                out_path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "BENCH_10M.json"
                )
                with open(out_path, "w") as f:
                    json.dump(detail, f, indent=1)
            except OSError:
                pass
        except Exception as e:  # noqa: BLE001
            errs["10m_setup"] = repr(e)[:300]
            traceback.print_exc(file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — even session setup failure
        errs["setup"] = repr(e)[:300]
        traceback.print_exc(file=sys.stderr)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "conformance-suite warm wall-clock, Spark local",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if hits_10m is not None:
        payload["hits_10m"] = hits_10m
    if errs:
        # names + truncated messages; full tracebacks already on stderr
        payload["errs"] = {k: v[:40] for k, v in errs.items()}
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1800:  # driver tail buffer is 2000 chars — degrade safely
        payload["queries"] = {k: round(v, 2) for k, v in timings.items()}
        if errs:
            payload["errs"] = {k: "" for k in errs}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1800:  # still too big: drop per-query detail, keep totals
        payload["queries"] = {"cb_total": timings.get("cb_total", 0.0)}
        line = json.dumps(payload, separators=(",", ":"))
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
