"""End-to-end curation-pipeline scale run: the full training-data
funnel COMPOSED — quality filter → exact dedup keep-one → MinHash-LSH
near-dup keep-one (connected components) → decontamination → weighted
mixture sampling → sequence packing — over the synthetic 1M/10M-doc
corpus (4% exact + 6% near duplicates planted by tools/gen_docs.py).

Each operator family already has its own per-stage artifact
(BENCH_DEDUP_*, BENCH_TEXT_*); this one measures what a user actually
runs: the stages CHAINED, each consuming the previous survivor set,
with per-stage wall clock, shuffle deltas, and the funnel row counts.
Lazy chaining is deliberate where possible — the quality filter and
the survivor semi-joins stay unmaterialized inside later stages'
scans wherever Spark can collapse them.

Writes BENCH_PIPELINE_{1M|10M|<n>K}.json.

Usage: python tools/bench_pipeline_scale.py [n_docs]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from cowsdb_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from cowsdb_spark.operators.text import (
        contamination_flags,
        pack_sequences,
        quality_score,
    )
    from cowsdb_spark.session import get_spark
    from tools.gen_docs import generate

    path = generate(n=n_docs)
    spark = get_spark("pipeline-scale")
    out: dict = {"n_docs": n_docs, "stages": {}, "funnel": {"load": n_docs}}

    def stage(name: str, fn):
        r0, w0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        result = fn()
        wall = round(time.perf_counter() - t0, 1)
        r1, w1 = _shuffle_totals(spark)
        out["stages"][name] = {
            "wall_s": wall,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        }
        print(f"{name}: {wall}s {out['stages'][name]}", flush=True)
        return result

    docs = spark.read.parquet(path).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 8).cast("string"))
    )

    # 1. quality filter (Gopher-style signal gate)
    q = quality_score(docs).filter(F.col("quality") >= 0.3).select("doc_id")
    cur = docs.join(q, "doc_id")
    out["funnel"]["quality"] = stage("quality_filter", cur.count)

    # 1b. trained-classifier + Gopher-rules AUDIT (r8): counts over
    # the RAW corpus scan, not a filter (the quality_score gate above
    # is the funnel's filter); the stage measures their full-corpus
    # scan cost (pure codegen: integer dot product + rule booleans;
    # two narrow scans, shuffle only the 1-row aggregates). Since the
    # v2 fixture (r9) the corpus carries a ~10% prose subpopulation,
    # so the audit must SEPARATE populations — keep fractions near
    # 0.10 are asserted below (r8 verdict: a 0/10M audit gives zero
    # discrimination signal).
    def model_audit():
        from cowsdb_spark.operators.text import gopher_rules

        mk = quality_score(docs).agg(
            F.sum(F.col("model_keep").cast("long")).alias("mk")
        )
        gp = gopher_rules(docs).agg(
            F.sum(F.col("gopher_pass").cast("long")).alias("gp")
        )
        return (
            int(mk.collect()[0]["mk"] or 0),
            int(gp.collect()[0]["gp"] or 0),
        )

    kept_counts = stage("classifier_gopher_audit", model_audit)
    out["funnel"]["model_keep_would_keep"] = kept_counts[0]
    out["funnel"]["gopher_pass_would_keep"] = kept_counts[1]
    # population-separation check: the generator plants prose at
    # doc_id % 10 == 3 (≈10% post-planting; probe: classifier keeps
    # ~100% prose / 0% salad, Gopher ~97% / 0%) — a keep fraction
    # outside [0.05, 0.15] means a gate lost its decision boundary
    for gate, kept in (
        ("model_keep", kept_counts[0]),
        ("gopher_pass", kept_counts[1]),
    ):
        frac = kept / n_docs
        out["funnel"][f"{gate}_frac"] = round(frac, 4)
        if not 0.05 <= frac <= 0.15:
            raise RuntimeError(
                f"{gate} kept {frac:.4f} of the corpus — expected ~0.10 "
                "(the planted prose subpopulation); the audit lost its "
                "discrimination signal"
            )

    # 2. exact dedup keep-one (drops the planted 4% byte-exact
    # copies); the survivor frontier is localCheckpoint-ed INSIDE the
    # stage — every later stage reads it, and near-dup banding must
    # not re-run the quality scan
    def exact_keep_one():
        keep = exact_dedup(cur).select("doc_id")
        return cur.join(keep, "doc_id").localCheckpoint()

    cur = stage("exact_dedup", exact_keep_one)
    out["funnel"]["exact_dedup"] = cur.count()

    # 3. near-dup keep-one: LSH pairs -> connected components -> drop
    # every member that is not its component's minimum id
    def near_dup():
        pairs = minhash_lsh_pairs(cur, min_jaccard=0.5).select("id_a", "id_b")
        comp = connected_components(pairs)
        drop = comp.filter(F.col("id") != F.col("comp")).select(
            F.col("id").alias("doc_id")
        )
        return cur.join(drop, "doc_id", "left_anti").localCheckpoint()

    cur = stage("near_dup_keep_one", near_dup)
    out["funnel"]["near_dup"] = cur.count()

    # 3b. duplicated-span scrub (r8): rewrite survivors, excising any
    # 16-gram still duplicated ACROSS the post-dedup corpus (spans two
    # generator phrases, so on this corpus doc-level keep-one already
    # removed most of them — the recorded near-zero removal is the
    # honest pipeline statement "doc dedup got there first", while the
    # stage still pays and records the full rewrite cost: one
    # body-sized doc_id join). Docs scrubbed to empty are dropped.
    def scrub():
        from cowsdb_spark.operators.text import scrub_dup_spans

        # checkpoint the scrub output ONCE — the removed-token agg and
        # the rewrite join both read the materialized frame instead of
        # re-running the gram pipeline (first cut executed it twice).
        # The join/filter wiring mirrors operators/text.py::
        # rewrite_scrubbed (only docs scrubbed TO empty drop) but
        # reuses the checkpointed scrub frame for both consumers.
        scr = scrub_dup_spans(
            cur, n=16, min_docs=2, key="hash"
        ).localCheckpoint()
        removed = scr.agg(F.sum("n_removed_tokens")).collect()[0][0]
        nxt = (
            cur.join(
                scr.select("doc_id", "scrubbed"), "doc_id", "left"
            )
            .filter(F.col("scrubbed").isNull() | (F.col("scrubbed") != ""))
            .withColumn("text", F.coalesce("scrubbed", "text"))
            .drop("scrubbed")
            .localCheckpoint()
        )
        return nxt, int(removed or 0)

    cur, removed_tokens = stage("scrub_dup_spans", scrub)
    out["funnel"]["scrub_removed_tokens"] = removed_tokens
    out["funnel"]["scrubbed"] = cur.count()

    # 4. decontamination: 500-doc eval set sampled from the corpus
    # (worst case: every eval gram exists in training); drop any doc
    # sharing an n-token span
    ev = docs.filter(F.col("doc_id") % (n_docs // 500) == 0)

    def decontaminate():
        flags = contamination_flags(cur, ev).filter(F.col("n_hits") > 0)
        return cur.join(
            flags.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint()

    cur = stage("decontaminate", decontaminate)
    out["funnel"]["decontaminated"] = cur.count()

    # 4b. BM25 retrieval-decontamination AUDIT (r8): the ranked
    # counterpart of the gram screen — 50 eval docs as BM25 queries
    # against the survivor corpus, counting suspects retrieved in any
    # top-5. Audit, not filter (the gram screen above is the gate);
    # the worst case for the broadcast-prune here is real: the
    # generator's 20k-word vocabulary means ~1.6k query terms match a
    # large fraction of all tokens, so the recorded shuffle bounds
    # the operator's cost on an adversarially small vocabulary.
    def bm25_audit():
        from cowsdb_spark.operators.retrieval import bm25_decontaminate

        ev50 = docs.filter(F.col("doc_id") % (n_docs // 50) == 0)
        return bm25_decontaminate(cur, ev50, k=5).count()

    out["funnel"]["bm25_suspects_top5"] = stage(
        "bm25_decontaminate_audit", bm25_audit
    )

    # 5. weighted mixture sampling (mix_sample's salted-md5 keep rule,
    # applied to the rows so packing sees the sampled set)
    two60 = float(1 << 60)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(two60)
    )
    rate = (
        F.when(F.col("source") == "src0", 0.5)
        .when(F.col("source") == "src1", 0.25)
        .otherwise(F.lit(1.0))
    )
    cur = cur.filter(u < rate)
    out["funnel"]["mixed"] = stage("mix_sample", cur.count)

    # 6. sequence packing of the final kept set
    def pack():
        bins = pack_sequences(cur, seq_len=1024, strata_col="source")
        return bins.agg(
            F.count("*").alias("n_bins"),
            F.sum("bin_tokens").alias("total_tokens"),
        ).collect()[0]

    packed = stage("pack_sequences", pack)
    out["funnel"]["bins"] = int(packed["n_bins"])
    out["funnel"]["packed_tokens"] = int(packed["total_tokens"])

    out["total_pipeline_s"] = round(
        sum(s["wall_s"] for s in out["stages"].values()), 1
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = (
        f"{n_docs // 1_000_000}M" if n_docs >= 1_000_000 else f"{n_docs // 1000}K"
    )
    with open(os.path.join(repo, f"BENCH_PIPELINE_{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
