"""ANN scale run: exact brute-force cosine top-k vs IVF probing a
partitioned inverted-file layout, at 1M vectors × 64 dims.

Converts the similarity-search "100 TB by design" claim into a
measured artifact (BENCH_ANN_1M.json): IVF build cost, the physical
partition-pruned layout (assigned table written partitionBy(_cell) —
a probe reads nprobe/n_cells of the files, the same pruning a real
deployment gets from object-store layout), per-query latency for
both paths, and recall@10 of IVF vs the exact answer.

The corpus is clustered Gaussians (512 centers), the regime IVF is
built for; queries are stored vectors spread across the corpus.

Usage: python tools/bench_ann_scale.py [n_vecs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
SEED = 11
DIMS = 64
N_CLUSTERS = 512


def gen_embeddings(n: int) -> str:
    """Deterministic clustered corpus: 512 Gaussian centers on the
    unit sphere, sigma 0.15 — written in 64k row groups so scans
    split (same rationale as gen_docs.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.abspath(os.path.join(FIXTURE_DIR, f"emb_{n}.parquet"))
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(N_CLUSTERS, DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    tmp = path + ".tmp"
    writer = pq.ParquetWriter(tmp, schema, compression="snappy")
    done = 0
    batch = 250_000
    while done < n:
        m = min(batch, n - done)
        which = rng.integers(0, N_CLUSTERS, size=m)
        v = centers[which] + rng.normal(scale=0.15, size=(m, DIMS))
        v = v.astype(np.float32)
        ids = np.arange(done, done + m, dtype=np.int64)
        tbl = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1)), DIMS
                ).cast(pa.list_(pa.float32())),
            },
            schema=schema,
        )
        for off in range(0, m, 65_536):
            writer.write_table(tbl.slice(off, 65_536))
        done += m
    writer.close()
    os.replace(tmp, path)
    return path


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pyspark.sql import functions as F

    from cowsdb_spark.operators.similarity import cosine_topk, ivf_build, ivf_topk
    from cowsdb_spark.session import get_spark

    t0 = time.perf_counter()
    path = gen_embeddings(n)
    gen_s = round(time.perf_counter() - t0, 1)

    spark = get_spark("ann-scale")
    emb = spark.read.parquet(path)

    out: dict = {"n_vecs": n, "dims": DIMS, "gen_s": gen_s}
    k = 10
    n_queries = 16
    qids = [int(i * (n // n_queries) + 7) for i in range(n_queries)]

    # query vectors (driver-side metadata fetch, O(n_queries))
    qvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    # ---- exact brute force, batch form: ONE corpus pass, GEMM per
    # Arrow batch, per-partition top-k combine (brute_topk_batch)
    from cowsdb_spark.operators.similarity import brute_topk_batch

    brute_topk_batch(emb, {qids[0]: qvecs[qids[0]]}, k=k).collect()  # warm
    t0 = time.perf_counter()
    rows = brute_topk_batch(emb, qvecs, k=k).collect()
    brute_s = time.perf_counter() - t0
    brute: dict[int, list[int]] = {}
    for r in rows:
        brute.setdefault(r.query_id, []).append(r.vec_id)
    out["brute_batch_total_s"] = round(brute_s, 2)
    out["brute_batch_per_query_s"] = round(brute_s / n_queries, 3)

    # single-query exact latency (the oracle-checked per-query kernel)
    cosine_topk(emb, qids[0], k=k).collect()  # warm
    t0 = time.perf_counter()
    for qid in qids[:4]:
        cosine_topk(emb, qid, k=k).collect()
    out["brute_single_query_s"] = round((time.perf_counter() - t0) / 4, 3)

    # ---- IVF build + physical inverted-file layout
    t0 = time.perf_counter()
    assigned, centroids = ivf_build(
        emb, n_centroids=256, train_sample=65_536, max_iter=10
    )
    ivf_dir = os.path.join("/tmp", f"moospark-ivf-{os.getpid()}")
    shutil.rmtree(ivf_dir, ignore_errors=True)
    # store the double `_v` lane only (the raw `_e` passthrough is an
    # in-plan optimization column; persisting both would double the
    # inverted-file footprint)
    assigned.select("vec_id", "_v", "_cell").write.partitionBy(
        "_cell"
    ).mode("overwrite").parquet(ivf_dir)
    build_s = round(time.perf_counter() - t0, 1)
    out["ivf_build_and_layout_s"] = build_s
    inv = spark.read.parquet(ivf_dir)

    nprobe = 16
    ivf_topk(inv, centroids, qvecs[qids[0]], k=k + 1, nprobe=nprobe).collect()
    hits = 0
    t0 = time.perf_counter()
    for qid in qids:
        got = [
            r.vec_id
            for r in ivf_topk(
                inv, centroids, qvecs[qid], k=k + 1, nprobe=nprobe
            ).collect()
            if r.vec_id != qid
        ][:k]
        hits += len(set(got) & set(brute[qid]))
    ivf_s = time.perf_counter() - t0
    out["ivf_nprobe"] = nprobe
    out["ivf_n_cells"] = 256
    out["ivf_total_s"] = round(ivf_s, 2)
    out["ivf_per_query_s"] = round(ivf_s / n_queries, 3)
    out["recall_at_10"] = round(hits / (n_queries * k), 4)
    # The two regimes, reported separately on purpose:
    # - ONLINE (one query at a time): IVF probes nprobe/n_cells of the
    #   files; the exact kernel must scan everything.
    # - OFFLINE batch (Q queries in one pass): the amortized exact
    #   GEMM wins until Q·nprobe << n_cells, because per-query IVF
    #   pays the per-job floor Q times and the probe-cell union
    #   approaches the whole corpus as Q grows.
    out["ivf_speedup_single_query"] = round(
        out["brute_single_query_s"] / out["ivf_per_query_s"], 2
    )
    out["ivf_scan_fraction_per_probe"] = round(nprobe / 256, 4)

    # pruning evidence: the probe plan must carry a _cell partition
    # filter (file pruning — the object-store story at scale)
    plan = (
        ivf_topk(inv, centroids, qvecs[qids[0]], k=k, nprobe=nprobe)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    out["partition_pruned"] = "PartitionFilters: [_cell" in plan or "_cell#" in plan.split(
        "PartitionFilters"
    )[-1][:200]

    shutil.rmtree(ivf_dir, ignore_errors=True)

    # ---- SemDeDup at scale (gemm tier): k seeds sized so clusters
    # average ~2k members (the published regime); assignment is one
    # map-side mapInPandas GEMM, the pair stage one applyInPandas
    # group per cluster — the only shuffle is the cluster-key
    # repartition of (id, vector).
    from cowsdb_spark.operators.semdedup import semdedup

    sd_k = 512
    sd_tau = 0.45
    t0 = time.perf_counter()
    sd = semdedup(emb, k=sd_k, tau=sd_tau, mode="gemm")
    agg = sd.groupBy().agg(
        F.count("*").alias("n"), F.sum("is_kept").alias("kept")
    ).collect()[0]
    sd_s = round(time.perf_counter() - t0, 2)
    out["semdedup_k"] = sd_k
    out["semdedup_tau"] = sd_tau
    out["semdedup_total_s"] = sd_s
    out["semdedup_kept"] = int(agg["kept"])
    out["semdedup_dropped"] = int(agg["n"] - agg["kept"])

    # the published construction (k-means clusters) at the same point:
    # ivf_build's Lloyd fit replaces the seed assignment; the dedup
    # rule downstream is identical
    t0 = time.perf_counter()
    sdk = semdedup(emb, k=sd_k, tau=sd_tau, mode="gemm", clustering="kmeans")
    aggk = sdk.groupBy().agg(
        F.count("*").alias("n"), F.sum("is_kept").alias("kept")
    ).collect()[0]
    out["semdedup_kmeans_total_s"] = round(time.perf_counter() - t0, 2)
    out["semdedup_kmeans_kept"] = int(aggk["kept"])

    # ---- Product quantization (PQ/ADC): 32x-compressed codes, the
    # storage/scan format a 100 TB embedding store actually keeps.
    # Encode once (map-side GEMM argmins), then answer queries by
    # scanning CODES with a per-query lookup table.
    # vectors are L2-normalized before encoding so ADC's L2 ordering
    # equals the cosine ordering of the exact ground truth
    # (‖a−b‖² = 2 − 2·cos on the unit sphere)
    from cowsdb_spark.operators.pq import pq_encode, pq_topk, pq_train

    unit = emb.select(
        F.col("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE))"
        ).alias("_raw"),
    ).select(
        "vec_id",
        F.expr(
            "transform(_raw, x -> x / sqrt(aggregate(_raw, 0D, "
            "(a, y) -> a + y * y)))"
        ).alias("embedding"),
    )
    from cowsdb_spark.operators.pq import pq_topk_rerank

    def unit_q(v):
        import numpy as np

        a = np.asarray(v, dtype=float)
        return a / np.linalg.norm(a)

    # two operating points: m=8 = 32x compression (max squeeze),
    # m=16 = 16x with finer subspaces — with the refine step the
    # quality point recovers ~0.96 recall on this dense geometry
    out["pq"] = {}
    for m in (8, 16):
        t0 = time.perf_counter()
        book = pq_train(unit, m=m)
        codes = pq_encode(unit, book)
        codes = codes.persist()
        codes.count()
        cell: dict = {
            "train_encode_s": round(time.perf_counter() - t0, 2),
            "compression_x": DIMS * 4 / m,
        }
        pq_topk(codes, book, unit_q(qvecs[qids[0]]), k=k + 1).collect()
        hits = 0
        t0 = time.perf_counter()
        for qid in qids:
            got = [
                r.vec_id
                for r in pq_topk(
                    codes, book, unit_q(qvecs[qid]), k=k + 1
                ).collect()
                if r.vec_id != qid
            ][:k]
            hits += len(set(got) & set(brute[qid]))
        cell["adc_per_query_s"] = round(
            (time.perf_counter() - t0) / n_queries, 3
        )
        cell["adc_recall_at_10"] = round(hits / (n_queries * k), 4)
        # ADC + exact re-rank (refine step): code scan proposes 10·k
        # candidates, the float column is read back for just those ids
        hits = 0
        t0 = time.perf_counter()
        for qid in qids:
            got = [
                r.vec_id
                for r in pq_topk_rerank(
                    codes, unit, book, unit_q(qvecs[qid]), k=k + 1, refine=10
                ).collect()
                if r.vec_id != qid
            ][:k]
            hits += len(set(got) & set(brute[qid]))
        cell["rerank_per_query_s"] = round(
            (time.perf_counter() - t0) / n_queries, 3
        )
        cell["rerank_recall_at_10"] = round(hits / (n_queries * k), 4)
        codes.unpersist()
        out["pq"][f"m{m}"] = cell

    # ---- IVF × PQ composed (IVFADC): the actual 100 TB serving shape —
    # coarse cells prune the files (codes written partitionBy(_cell)),
    # residual PQ codes shrink what survives, per-cell ADC tables score,
    # exact re-rank refines. Compare against the ivf-only and pq-only
    # blocks above at the same nprobe / m operating points.
    from cowsdb_spark.operators.pq import (
        ivf_pq_build,
        ivf_pq_topk,
        ivf_pq_topk_rerank,
    )

    out["ivf_pq"] = {}
    for m in (8, 16):
        t0 = time.perf_counter()
        ivfpq_codes, ivfpq_cents, ivfpq_book = ivf_pq_build(
            unit, n_centroids=256, m=m, train_sample=65_536, max_iter=10
        )
        ivfpq_dir = os.path.join("/tmp", f"moospark-ivfpq-{os.getpid()}-{m}")
        shutil.rmtree(ivfpq_dir, ignore_errors=True)
        ivfpq_codes.write.partitionBy("_cell").mode("overwrite").parquet(
            ivfpq_dir
        )
        ivfpq_build_s = round(time.perf_counter() - t0, 1)
        inv_codes = spark.read.parquet(ivfpq_dir)

        cell = {
            "n_cells": 256,
            "m": m,
            "nprobe": nprobe,
            "build_and_layout_s": ivfpq_build_s,
            "compression_x": DIMS * 4 / m,
            "scan_fraction_per_probe": round(nprobe / 256, 4),
        }
        ivf_pq_topk(
            inv_codes, ivfpq_cents, ivfpq_book, unit_q(qvecs[qids[0]]),
            k=k + 1, nprobe=nprobe,
        ).collect()  # warm
        hits = 0
        t0 = time.perf_counter()
        for qid in qids:
            got = [
                r.vec_id
                for r in ivf_pq_topk(
                    inv_codes, ivfpq_cents, ivfpq_book, unit_q(qvecs[qid]),
                    k=k + 1, nprobe=nprobe,
                ).collect()
                if r.vec_id != qid
            ][:k]
            hits += len(set(got) & set(brute[qid]))
        cell["adc_per_query_s"] = round(
            (time.perf_counter() - t0) / n_queries, 3
        )
        cell["adc_recall_at_10"] = round(hits / (n_queries * k), 4)

        hits = 0
        t0 = time.perf_counter()
        for qid in qids:
            got = [
                r.vec_id
                for r in ivf_pq_topk_rerank(
                    inv_codes, unit, ivfpq_cents, ivfpq_book,
                    unit_q(qvecs[qid]), k=k + 1, nprobe=nprobe, refine=10,
                ).collect()
                if r.vec_id != qid
            ][:k]
            hits += len(set(got) & set(brute[qid]))
        cell["rerank_per_query_s"] = round(
            (time.perf_counter() - t0) / n_queries, 3
        )
        cell["rerank_recall_at_10"] = round(hits / (n_queries * k), 4)

        # pruning evidence: the composed probe plan carries the _cell
        # partition filter exactly like the ivf-only block
        plan = (
            ivf_pq_topk(
                inv_codes, ivfpq_cents, ivfpq_book, unit_q(qvecs[qids[0]]),
                k=k, nprobe=nprobe,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        cell["partition_pruned"] = (
            "PartitionFilters: [_cell" in plan
            or "_cell#" in plan.split("PartitionFilters")[-1][:200]
        )
        shutil.rmtree(ivfpq_dir, ignore_errors=True)
        out["ivf_pq"][f"m{m}"] = cell

    # ---- incremental ingest + staleness probe (r9, VERDICT r8 #4):
    # freeze the index built on the FIRST 90% of vectors, encode the
    # last 10% with ivf_pq_encode_increment (one map-side pass — no
    # re-train, no store re-encode), append to the partitionBy(_cell)
    # store, and measure rerank recall@10 of the GROWN store under the
    # frozen index vs the fresh full rebuild above. On this stationary
    # corpus the frozen index should hold recall; under distribution
    # drift the gap widens — that gap is the re-build trigger signal
    # a daily pipeline watches.
    from cowsdb_spark.operators.pq import ivf_pq_encode_increment

    m = 16
    cut = int(n * 0.9)
    base_unit = unit.filter(F.col("vec_id") < cut)
    new_unit = unit.filter(F.col("vec_id") >= cut)
    t0 = time.perf_counter()
    base_codes, base_cents, base_book = ivf_pq_build(
        base_unit, n_centroids=256, m=m, train_sample=65_536, max_iter=10
    )
    inc_dir = os.path.join("/tmp", f"moospark-ivfpq-incr-{os.getpid()}")
    shutil.rmtree(inc_dir, ignore_errors=True)
    base_codes.write.partitionBy("_cell").mode("overwrite").parquet(inc_dir)
    base_build_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    ivf_pq_encode_increment(new_unit, base_cents, base_book).write.mode(
        "append"
    ).partitionBy("_cell").parquet(inc_dir)
    append_s = round(time.perf_counter() - t0, 1)
    grown = spark.read.parquet(inc_dir)
    n_grown = grown.count()
    hits = 0
    t0 = time.perf_counter()
    for qid in qids:
        got = [
            r.vec_id
            for r in ivf_pq_topk_rerank(
                grown, unit, base_cents, base_book, unit_q(qvecs[qid]),
                k=k + 1, nprobe=nprobe, refine=10,
            ).collect()
            if r.vec_id != qid
        ][:k]
        hits += len(set(got) & set(brute[qid]))
    q_wall = time.perf_counter() - t0
    fresh = out["ivf_pq"][f"m{m}"]["rerank_recall_at_10"]
    incr_recall = round(hits / (n_queries * k), 4)
    out["ivf_pq_incremental"] = {
        "m": m,
        "base_frac": 0.9,
        "increment_frac": 0.1,
        "n_grown_store": n_grown,
        "base_build_and_layout_s": base_build_s,
        "increment_encode_append_s": append_s,
        "full_rebuild_s_reference": out["ivf_pq"][f"m{m}"][
            "build_and_layout_s"
        ],
        "grown_store_rerank_recall_at_10": incr_recall,
        "fresh_rebuild_rerank_recall_at_10": fresh,
        "staleness_recall_gap": round(fresh - incr_recall, 4),
        "rerank_per_query_s": round(q_wall / n_queries, 3),
    }
    # drift lane: what the probe actually shows when the increment's
    # distribution moves — a NEW TOPIC: the increment collapses into
    # a tight cluster around a direction the frozen quantizer never
    # trained on (0.25·v + u, u a fixed unit vector, renormalized —
    # within-cluster spread ~0.25). Staleness in IVFADC does
    # NOT necessarily show up as rerank recall (drift concentrates
    # the increment into few frozen cells, which can even HELP probe
    # coverage while wrecking operational behavior); the honest
    # signals a pipeline watches are (a) ADC-only recall — residual
    # quantization error against codebooks fit elsewhere — and
    # (b) hot-cell concentration: the share of the increment landing
    # in its single fullest cell, which turns the per-cell partition
    # prune into a scan of one giant partition. Queries come FROM the
    # drifted region; ground truth is exact cosine over base∪drifted.
    u = np.random.default_rng(99).normal(size=DIMS)
    u /= np.linalg.norm(u)
    ulit = F.array(*[F.lit(float(x)) for x in u])
    shifted = F.zip_with(
        "embedding", ulit, lambda a, b: F.lit(0.25) * a + b
    )
    drifted = new_unit.withColumn("_s", shifted).select(
        "vec_id",
        F.expr(
            "transform(_s, x -> x / sqrt(aggregate(_s, 0D, (a, y) -> a + y * y)))"
        ).alias("embedding"),
    )
    corpus2 = base_unit.unionByName(drifted)
    dq_ids = [int(cut + 1 + i * ((n - cut) // 8)) for i in range(8)]
    dqvecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in drifted.filter(F.col("vec_id").isin(dq_ids)).collect()
    }
    rows = brute_topk_batch(corpus2, dqvecs, k=k + 1).collect()
    truth: dict[int, list[int]] = {}
    for r in rows:
        if r.vec_id != r.query_id:
            truth.setdefault(r.query_id, []).append(r.vec_id)
    truth = {q: v[:k] for q, v in truth.items()}

    def recall_with(codes_df, cents_, book_, rerank: bool):
        hits = 0
        for qid in dq_ids:
            if rerank:
                got = [
                    r.vec_id
                    for r in ivf_pq_topk_rerank(
                        codes_df, corpus2, cents_, book_, dqvecs[qid],
                        k=k + 1, nprobe=nprobe, refine=10,
                    ).collect()
                    if r.vec_id != qid
                ][:k]
            else:
                got = [
                    r.vec_id
                    for r in ivf_pq_topk(
                        codes_df, cents_, book_, dqvecs[qid],
                        k=k + 1, nprobe=nprobe,
                    ).collect()
                    if r.vec_id != qid
                ][:k]
            hits += len(set(got) & set(truth[qid]))
        return round(hits / (len(dq_ids) * k), 4)

    def max_cell_share(codes_df):
        top = (
            codes_df.groupBy("_cell").count()
            .orderBy(F.col("count").desc()).limit(1).collect()[0]["count"]
        )
        total = codes_df.count()
        return round(top / total, 4)

    inc_frozen = ivf_pq_encode_increment(drifted, base_cents, base_book)
    frozen_grown = base_codes.unionByName(inc_frozen)
    re_codes, re_cents, re_book = ivf_pq_build(
        corpus2, n_centroids=256, m=m, train_sample=65_536, max_iter=10
    )
    inc_ids = drifted.select("vec_id")
    out["ivf_pq_incremental"]["drift_lane"] = {
        "drift": "new topic: 0.25*v + u (fixed unseen unit vector), renormalized; queries from the drifted region",
        "frozen_index_adc_recall_at_10": recall_with(
            frozen_grown, base_cents, base_book, rerank=False
        ),
        "rebuilt_index_adc_recall_at_10": recall_with(
            re_codes, re_cents, re_book, rerank=False
        ),
        "frozen_index_rerank_recall_at_10": recall_with(
            frozen_grown, base_cents, base_book, rerank=True
        ),
        "rebuilt_index_rerank_recall_at_10": recall_with(
            re_codes, re_cents, re_book, rerank=True
        ),
        # hot-cell concentration of the INCREMENT under each index:
        # drift piles the new vectors into few frozen cells (breaking
        # the partition prune's balance); a rebuild re-spreads them
        "increment_max_cell_share_frozen": max_cell_share(inc_frozen),
        "increment_max_cell_share_rebuilt": max_cell_share(
            re_codes.join(inc_ids, "vec_id", "left_semi")
        ),
    }
    shutil.rmtree(inc_dir, ignore_errors=True)

    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(__file__), "..", f"BENCH_ANN_{n//1_000_000}M.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
