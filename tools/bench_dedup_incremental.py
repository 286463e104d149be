"""Incremental NEAR-dup scale run (VERDICT r7 #4): LSH of a 10M-doc
increment against a PERSISTED 10M-doc signature store, vs re-running
full-corpus LSH over all 20M.

The daily-pipeline claim measured: yesterday's corpus is never
re-hashed — its (id, _sig) store (a few GB next to a corpus measured
in TB) is read back from parquet and band-joined; only the increment
pays the signature UDF. The artifact records both paths' wall-clock
and shuffle volume on the same box, plus a value-level equivalence
check (incremental pairs == full pairs minus seen×seen).

Corpus: tools/gen_docs at 2N rows, split by doc_id parity so the
planted duplicate classes straddle the seen/new boundary (a range
split would leave the cross-corpus lane empty — dup planting is
within-batch).

Usage: python tools/bench_dedup_incremental.py [n_seen] [n_new]
(n_new defaults to n_seen — the symmetric stress point; the
realistic daily shape is n_new << n_seen, e.g. 10000000 1000000)
Writes BENCH_DEDUP_INCR_{seen}M_{new}M.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_dedup_scale import _shuffle_totals  # noqa: E402


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_new = int(sys.argv[2]) if len(sys.argv) > 2 else n_seen
    from cowsdb_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        minhash_signature_table,
    )
    from cowsdb_spark.session import get_spark
    from tools.gen_docs import generate

    t0 = time.perf_counter()
    path = generate(n=2 * n_seen)
    gen_s = round(time.perf_counter() - t0, 1)

    spark = get_spark("dedup-incr-scale")
    all_rows = spark.read.parquet(path)
    # parity split so planted duplicate classes straddle the boundary;
    # the increment is the first n_new odd ids (asymmetric daily shape
    # when n_new < n_seen). "docs" = the union both paths see.
    seen = all_rows.filter(F.col("doc_id") % 2 == 0)
    new = all_rows.filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 2 * n_new)
    )
    docs = seen.unionByName(new)

    out: dict = {
        "n_seen": n_seen,
        "n_new": n_new,
        "gen_s": gen_s,
        "stages": {},
    }

    def stage(name: str, fn):
        r0, w0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        result = fn()
        wall = round(time.perf_counter() - t0, 1)
        r1, w1 = _shuffle_totals(spark)
        out["stages"][name] = {
            "wall_s": wall,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1) if r0 >= 0 else None,
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1) if w0 >= 0 else None,
        }
        print(f"{name}: {wall}s  {out['stages'][name]}", flush=True)
        return result

    store_dir = os.path.join("/tmp", f"moospark-sigstore-{os.getpid()}")
    shutil.rmtree(store_dir, ignore_errors=True)

    # ---- yesterday: hash the seen corpus ONCE, persist the store
    stage(
        "build_store",
        lambda: minhash_signature_table(seen).write.parquet(store_dir),
    )
    out["store_mb"] = round(
        sum(
            os.path.getsize(os.path.join(store_dir, f))
            for f in os.listdir(store_dir)
        )
        / 1e6,
        1,
    )

    # ---- today: increment vs the read-back store
    store = spark.read.parquet(store_dir)
    incr = stage(
        "incremental_pairs",
        lambda: minhash_lsh_pairs_incremental(
            new, store, min_jaccard=0.5
        ).persist(),
    )
    out["incremental_pairs"] = stage("incremental_count", lambda: incr.count())
    out["incremental_cross_pairs"] = incr.filter(
        (F.col("id_a") % 2 == 0) | (F.col("id_b") % 2 == 0)
    ).count()

    # ---- today, bucketed-store variant: the banded keys were ALSO
    # persisted (bucketBy(band, bh)), so the candidate join reads the
    # store with ZERO exchange — only the increment's slim keys
    # shuffle into the bucket scheme. This is the 100 TB layout; the
    # shuffle delta vs the plain path is the point of the cell.
    from cowsdb_spark.operators.dedup import banded_keys

    tbl = f"sig_bands_{os.getpid()}"
    stage(
        "build_banded_store",
        lambda: banded_keys(store, "doc_id", 32, 8)
        .write.bucketBy(32, "band", "bh")
        .mode("overwrite")
        .saveAsTable(tbl),
    )
    incr_b = stage(
        "incremental_pairs_bucketed",
        lambda: minhash_lsh_pairs_incremental(
            new, store, min_jaccard=0.5, seen_banded=spark.table(tbl)
        ).persist(),
    )
    out["incremental_pairs_bucketed"] = stage(
        "incremental_bucketed_count", lambda: incr_b.count()
    )
    out["bucketed_matches_plain"] = (
        incr_b.join(incr, ["id_a", "id_b"], "left_anti").count() == 0
        and incr.join(incr_b, ["id_a", "id_b"], "left_anti").count() == 0
    )
    incr_b.unpersist()
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    # ---- the naive alternative: full LSH over seen+new every day
    full = stage(
        "full_corpus_pairs",
        lambda: minhash_lsh_pairs(docs, min_jaccard=0.5).persist(),
    )
    out["full_pairs"] = stage("full_count", lambda: full.count())

    # ---- equivalence: incremental == full minus seen×seen (both
    # directions via anti-joins on the pair key; 0 means identical)
    want = full.filter(
        ~((F.col("id_a") % 2 == 0) & (F.col("id_b") % 2 == 0))
    )
    missing = want.join(incr, ["id_a", "id_b"], "left_anti").count()
    extra = incr.join(want, ["id_a", "id_b"], "left_anti").count()
    out["equivalence"] = {"missing_vs_full": missing, "extra_vs_full": extra}

    out["incremental_total_s"] = round(
        out["stages"]["incremental_pairs"]["wall_s"]
        + out["stages"]["incremental_count"]["wall_s"],
        1,
    )
    out["full_total_s"] = round(
        out["stages"]["full_corpus_pairs"]["wall_s"]
        + out["stages"]["full_count"]["wall_s"],
        1,
    )
    out["daily_speedup_x"] = round(
        out["full_total_s"] / max(out["incremental_total_s"], 0.1), 2
    )

    incr.unpersist()
    full.unpersist()
    shutil.rmtree(store_dir, ignore_errors=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(
        os.path.join(
            repo,
            f"BENCH_DEDUP_INCR_{n_seen // 1_000_000}M_"
            f"{n_new // 1_000_000}M.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
