"""Text-pipeline scale run: PII scan/scrub, contamination screen,
token stats, and quality scoring over a 10M-doc synthetic corpus,
with per-stage wall-clock and shuffle bytes.

Companion to bench_dedup_scale.py — together they cover every
first-class training-data operator family at 10M documents. PII and
quality stages are pure codegen with ZERO shuffle (the artifact
records it), so their cluster-scale cost is exactly one parquet
scan; the contamination screen shuffles only (doc_id, int64 gram id)
pairs that matched the broadcast eval set.

Writes BENCH_TEXT_{10M|1M|<n>K}.json, sized by n_docs.

Usage: python tools/bench_text_scale.py [n_docs]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from cowsdb_spark.operators.text import (
        contamination_flags,
        pii_scan,
        pii_scrub,
        quality_score,
        token_stats,
    )
    from cowsdb_spark.session import get_spark
    from tools.gen_docs import generate

    t0 = time.perf_counter()
    path = generate(n=n_docs)
    gen_s = round(time.perf_counter() - t0, 1)

    spark = get_spark("text-scale")
    docs = spark.read.parquet(path)

    out: dict = {"n_docs": n_docs, "gen_s": gen_s, "stages": {}}

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

    # 1. PII triage: count docs with any hit (forces full evaluation
    # of every regexp on every doc; the global agg shuffles one
    # partial row per task)
    out["pii_flagged"] = stage(
        "pii_scan",
        lambda: pii_scan(docs)
        .filter(F.col("pii_total") > 0)
        .count(),
    )

    # 2. PII scrub: checksum of cleaned lengths (forces every
    # replacement; no shuffle beyond the 1-row agg)
    out["scrub_len_sum"] = stage(
        "pii_scrub",
        lambda: pii_scrub(docs)
        .agg(F.sum(F.length("clean_text"))).collect()[0][0],
    )

    # 3. quality + token stats (C4/Gopher-style signals), one pass
    out["mean_quality"] = stage(
        "quality_score",
        lambda: float(
            quality_score(docs).agg(F.avg("quality")).collect()[0][0]
        ),
    )
    out["total_tokens"] = stage(
        "token_stats",
        lambda: token_stats(docs).agg(F.sum("n_tokens_ws")).collect()[0][0],
    )

    # 4. contamination screen: eval set = 1000 docs sampled from the
    # corpus itself (worst case: every eval gram exists in training)
    ev = docs.filter(F.col("doc_id") % (n_docs // 1000) == 0)
    out["contaminated_docs"] = stage(
        "contamination",
        lambda: contamination_flags(
            docs.join(F.broadcast(ev.select("doc_id")), "doc_id", "left_anti"),
            ev,
            n=8,
        ).count(),
    )

    # 5. weighted mixture sampling + split (new r7): two salted-md5
    # projections and ONE map-side-combinable agg on the synthetic
    # source key — the artifact should show shuffle ~= bytes of the
    # 20-row aggregate, i.e. effectively zero
    from cowsdb_spark.operators.text import dup_ngram_coverage, mix_sample

    srcd = docs.withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
    )
    weights = {f"src{i}": (0.8 if i % 2 == 0 else 0.35) for i in range(20)}
    out["mix_kept"] = stage(
        "mix_sample",
        lambda: mix_sample(srcd, weights)
        .agg(F.sum("n_kept")).collect()[0][0],
    )

    # 6. cross-doc duplicated n-gram coverage (new r7): the heavy one —
    # positional 6-grams explode ~(tokens-5) rows/doc, the distinct-doc
    # count and the join back are gram-keyed shuffles, the coverage
    # union is (doc, int) pairs; per-stage shuffle bytes recorded so
    # the linear-in-grams claim is checkable against the 1M point
    out["dup_fingerprint_text"] = stage(
        "dup_ngram_coverage",
        lambda: (
            dup_ngram_coverage(docs, n=6, min_docs=2)
            .agg(
                F.sum((F.col("n_dup_grams") > 0).cast("long")).alias("flagged"),
                F.sum("n_dup_grams").alias("dup_grams"),
                F.sum(
                    F.round(F.col("dup_token_frac") * 10000).cast("long")
                ).alias("covq"),
            )
            .collect()[0]
        ),
    )
    out["dup_fingerprint_text"] = [
        out["dup_fingerprint_text"]["flagged"],
        out["dup_fingerprint_text"]["dup_grams"],
        out["dup_fingerprint_text"]["covq"],
    ]

    # 6b. the same metric on the xxhash64 gram-key lane (the 100 TB
    # path: 8-byte keys through stages 2-3 instead of ~n words of
    # text). Both lanes record a value-level fingerprint (flagged
    # docs, total dup grams, quantized coverage sum) so the
    # equal-output claim is measured at scale, not asserted.
    def lane_fingerprint(key):
        r = (
            dup_ngram_coverage(docs, n=6, min_docs=2, key=key)
            .agg(
                F.sum((F.col("n_dup_grams") > 0).cast("long")).alias("flagged"),
                F.sum("n_dup_grams").alias("dup_grams"),
                F.sum(F.round(F.col("dup_token_frac") * 10000).cast("long")).alias(
                    "covq"
                ),
            )
            .collect()[0]
        )
        return [r["flagged"], r["dup_grams"], r["covq"]]

    out["dup_fingerprint_hashed"] = stage(
        "dup_ngram_coverage_hashed", lambda: lane_fingerprint("hash")
    )
    out["dup_lanes_equal"] = out["dup_fingerprint_hashed"] == out.get(
        "dup_fingerprint_text"
    )

    # 6c. duplicated-span SCRUB (new r8): the rewrite counterpart of
    # the coverage flag. Unlike the flag op (bodies never shuffle),
    # a rewrite must bring each body together with its dup-start set
    # once — ONE doc_id-keyed join — so the corpus pays exactly one
    # body-sized shuffle; this stage records that cost as a number.
    # n=16 spans two of the generator's 8-word phrases, so only the
    # PLANTED duplicates trigger: exact copies scrub to empty, near
    # dups (one phrase swapped) scrub partially — the merged-block /
    # kept-gap geometry actually executes at scale instead of
    # degenerating to all-covered (at n=6 the 50k-phrase pool makes
    # every position duplicated).
    from cowsdb_spark.operators.text import scrub_dup_spans

    def scrub_fingerprint():
        r = (
            scrub_dup_spans(docs, n=16, min_docs=2, key="hash")
            .agg(
                F.sum((F.col("n_removed_tokens") > 0).cast("long")).alias(
                    "touched"
                ),
                F.sum("n_removed_tokens").alias("removed"),
                F.sum(F.length("scrubbed")).alias("len_sum"),
            )
            .collect()[0]
        )
        return [int(r["touched"]), int(r["removed"]), int(r["len_sum"])]

    out["scrub_fingerprint_hashed_n16"] = stage(
        "scrub_dup_spans_hashed_n16", scrub_fingerprint
    )

    # 7. BM25 retrieval (new r8): 100 queries (first 8 tokens of every
    # n/100-th doc) against the full corpus. The claim to measure:
    # query terms broadcast-prune the exploded token stream map-side,
    # so shuffle is postings-of-query-terms sized, NOT corpus sized —
    # the artifact records it next to the corpus token count.
    from cowsdb_spark.operators.retrieval import bm25_topk

    qdocs = docs.filter(F.col("doc_id") % (n_docs // 100) == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split("text", " "), 1, 8), " "
        ).alias("qtext"),
    )

    def bm25_fingerprint():
        r = (
            bm25_topk(docs, qdocs, k=10)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("score_m").alias("sum_m"),
                F.sum(
                    F.when(F.col("rank") == 1, F.col("doc_id")).otherwise(0)
                ).alias("top1_ids"),
            )
            .collect()[0]
        )
        return [int(r["rows"]), int(r["sum_m"]), int(r["top1_ids"])]

    out["bm25_fingerprint"] = stage("bm25_topk_100q", bm25_fingerprint)

    # 8. BPE tokenizer training: the corpus-scale cost is ONE
    # word-frequency shuffle; the 8 merge iterations then run on the
    # bounded distinct-word table (the artifact shows the shuffle is
    # word-count-sized, not corpus-sized), plus one zero-shuffle
    # tokenize pass applying the learned merges
    from cowsdb_spark.operators.bpe import tokenize_bpe, train_bpe

    merges_rows = stage(
        "bpe_train_8", lambda: train_bpe(docs, n_merges=8).collect()
    )
    out["bpe_merges"] = [
        [r["lft"], r["rgt"], int(r["pair_count"])] for r in merges_rows
    ]
    out["bpe_total_tokens"] = stage(
        "bpe_tokenize",
        lambda: tokenize_bpe(
            docs, [(r["lft"], r["rgt"]) for r in merges_rows]
        )
        .agg(F.sum("n_tokens"))
        .collect()[0][0],
    )

    # 9. model-free dense lane (r9): hashed token-count embeddings for
    # the whole corpus (one slim (id, bucket) aggregate — the shuffle
    # the artifact records is min(doc_len, dim) ints per doc, NOT the
    # bodies), then SemDeDup over those vectors — semantic dedup on a
    # corpus that has no neural encoder. Keep/drop counts make the
    # signal visible: planted near-dup pairs have cosine ≈ 1 in
    # hashed space, so the drop count tracks the planted dup rate.
    from cowsdb_spark.operators.embeddings import hashed_embedding
    from cowsdb_spark.operators.semdedup import semdedup

    # capped at 1M docs (recorded, not silent): SemDeDup's pair stage
    # is O(Σ cluster²·dim) — at the 512-seed/1M point clusters average
    # ~2k members (the published regime); 10M at the same density
    # would need k≈5k seeds and ~25× the pair flops, a run of its own
    sd_n = min(n_docs, 1_000_000)

    def hashed_semdedup():
        sub = docs.filter(F.col("doc_id") < sd_n)
        emb = hashed_embedding(sub, dim=256).withColumnRenamed(
            "doc_id", "vec_id"
        ).localCheckpoint()
        sd = semdedup(emb, k=512, tau=0.9, mode="gemm")
        agg = sd.groupBy().agg(
            F.count("*").alias("n"), F.sum("is_kept").alias("kept")
        ).collect()[0]
        return [int(agg["n"]), int(agg["n"] - agg["kept"])]

    out["hashed_semdedup_n_dropped"] = stage(
        "hashed_embedding_semdedup_1M", hashed_semdedup
    )

    out["total_pipeline_s"] = round(
        sum(s["wall_s"] for s in out["stages"].values()), 1
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = (
        f"{n_docs // 1_000_000}M" if n_docs >= 1_000_000 else f"{n_docs // 1000}K"
    )
    with open(os.path.join(repo, f"BENCH_TEXT_{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
