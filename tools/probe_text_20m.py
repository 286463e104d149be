"""20M-doc scale probe for the two r8 text operators — the third
point of the 1M → 10M → 20M linearity series (BENCH_TEXT_{1M,10M}
carry the full pipeline; this probe re-measures ONLY the new heavy
stages at 2× the largest corpus, with the same fingerprints so the
values are checkable against a rerun).

Writes BENCH_TEXT_20M.json: scrub_dup_spans (hashed lane, n=16) and
bm25_topk (100 queries), wall + shuffle deltas + value fingerprints.

Usage: python tools/probe_text_20m.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_dedup_scale import _shuffle_totals  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from cowsdb_spark.operators.retrieval import bm25_topk
    from cowsdb_spark.operators.text import scrub_dup_spans
    from cowsdb_spark.session import get_spark
    from tools.gen_docs import generate

    path = generate(n=n_docs)
    spark = get_spark("text-probe-20m")
    docs = spark.read.parquet(path)
    out: dict = {"n_docs": n_docs, "stages": {}}

    def stage(name, fn):
        r0, w0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        res = fn()
        wall = round(time.perf_counter() - t0, 1)
        r1, w1 = _shuffle_totals(spark)
        out["stages"][name] = {
            "wall_s": wall,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(f"{name}: {wall}s {out['stages'][name]}", flush=True)
        return res

    def scrub_fp():
        r = (
            scrub_dup_spans(docs, n=16, min_docs=2, key="hash")
            .agg(
                F.sum((F.col("n_removed_tokens") > 0).cast("long")).alias("t"),
                F.sum("n_removed_tokens").alias("r"),
                F.sum(F.length("scrubbed")).alias("l"),
            )
            .collect()[0]
        )
        return [int(r["t"]), int(r["r"]), int(r["l"])]

    out["scrub_fingerprint_hashed_n16"] = stage(
        "scrub_dup_spans_hashed_n16", scrub_fp
    )

    qdocs = docs.filter(F.col("doc_id") % (n_docs // 100) == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("qtext"),
    )

    def bm25_fp():
        r = (
            bm25_topk(docs, qdocs, k=10)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("score_m").alias("sum_m"),
            )
            .collect()[0]
        )
        return [int(r["rows"]), int(r["sum_m"])]

    out["bm25_fingerprint"] = stage("bm25_topk_100q", bm25_fp)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_TEXT_20M.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
