"""Capture .explain("formatted") for every registry query.

Usage: python tools/capture_plans.py <outdir> [suffix] [names...]

Writes <outdir>/<name>_<suffix>.txt for each registry entry (default
suffix "before"). Plans are captured under the SAME session the bench
uses (cowsdb_spark.session.get_spark) at $SPARK_GRAFT_SF_DIR, so the
committed plan files describe exactly what bench.py times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    from cowsdb_spark.queries import registry
    from cowsdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("moospark-plan-capture")
    for name, qd in sorted(registry().items()):
        if only and name not in only:
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = qd.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"CAPTURE ERROR: {e!r}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
