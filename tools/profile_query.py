"""Profile registry queries: wall time + job/stage counts.

Usage: python tools/profile_query.py [reps] [names...]

Runs each named registry entry (default: all) under the bench session
at $SPARK_GRAFT_SF_DIR with the bench timing protocol (one warm-up,
then min-of-reps on .collect()), and reports per-query wall seconds
together with the number of Spark jobs and stages the timed pass
submitted (statusTracker deltas) — the fixed-overhead signal that
dominates sf0.1 walls. Diagnostics to stderr, one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = set(sys.argv[2:])

    from cowsdb_spark.queries import registry
    from cowsdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("moospark-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name, qd in sorted(registry().items()):
        if only and name not in only:
            continue
        try:
            sc.setJobDescription(f"profile:{name}")
            qd.spark(spark, sf_dir).collect()  # warm-up (same as bench)
            best, best_jobs, best_stages = float("inf"), 0, 0
            for _ in range(reps):
                jobs0 = tracker.getJobIdsForGroup(None)
                n0 = max(jobs0) if jobs0 else -1
                t0 = time.perf_counter()
                df = qd.spark(spark, sf_dir)
                df.collect()
                dt = time.perf_counter() - t0
                jobs1 = tracker.getJobIdsForGroup(None)
                new_jobs = [j for j in jobs1 if j > n0]
                stages = 0
                for j in new_jobs:
                    ji = tracker.getJobInfo(j)
                    if ji:
                        stages += len(ji.stageIds)
                if dt < best:
                    best, best_jobs, best_stages = dt, len(new_jobs), stages
            out[name] = {
                "sec": round(best, 3),
                "jobs": best_jobs,
                "stages": best_stages,
            }
            print(f"{name}: {best:.3f}s jobs={best_jobs} stages={best_stages}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": repr(e)[:200]}
            print(f"{name}: ERR {e!r}", file=sys.stderr)
        finally:
            sc.setJobDescription(None)
    print("PROFILE_JSON " + json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
