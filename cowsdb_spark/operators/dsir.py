"""DSIR — Data Selection via Importance Resampling.

Public-knowledge basis: Xie et al. 2023 (arXiv:2302.03169) — select
pretraining data that matches a target distribution by (1) fitting
cheap hashed bag-of-ngram language models to the target and the raw
corpus, (2) scoring every raw document with the importance
log-weight log p_target(x) − log p_raw(x), (3) Gumbel-top-k
resampling by that weight.

Spark-first / 100 TB design:

- Feature hashing uses the engine-portable md5-top-60-bit
  construction (the t06/t33 lane): ``bucket = md5_60(word) mod B`` —
  deterministic across engines, runs, and cluster sizes.
- Model fit is ONE word-keyed shuffle producing a ≤B-row table
  (raw + target counts per bucket via conditional sums in the same
  aggregate — one corpus pass for both models). Laplace-smoothed
  log-prob differences attach to that tiny table.
- Scoring re-joins exploded words to the broadcast model and sums
  the per-bucket diffs per document: one doc-keyed shuffle of
  (doc_id, double) rows, map-side combined.
- Resampling is deterministic Gumbel top-k: u = md5_60(salt‖id)/2⁶⁰,
  g = −ln(−ln u), score = logw + g — no RNG state, identical on any
  engine (the paper's Gumbel trick with a salted-hash uniform).

Float discipline: per-doc log-weight sums are ROUND(…, 4) like t40's
mean-ln aggregation (summation order differs between engines at
~1e-12, far inside the rounding margin); ordering ties break on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def _md5_60(col: Column) -> Column:
    """Top 60 bits of md5 as a BIGINT (the t06 oracle-mode lane)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def dsir_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, logw): hashed-unigram importance log-weight of
    every document against the *target* predicate's sub-corpus."""
    words = docs.select(
        F.col(id_col),
        target.cast("int").alias("_t"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w"),
    ).filter(F.col("_w") != "")
    words = words.withColumn(
        "_b", _md5_60(F.col("_w")) % F.lit(n_buckets)
    )
    model = words.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_raw_c"),
        F.sum("_t").cast("long").alias("_tgt_c"),
    )
    # r9: model feeds BOTH totals and scored — without a checkpoint
    # the corpus-sized tokenize→explode→md5 pipeline under it executes
    # once per consumer (3 full corpus passes incl. the scoring join;
    # plan showed 3 documents scans, no ReusedExchange). The table is
    # ≤n_buckets rows, so materializing it is free and brings the
    # operator to the two-pass floor (model fit + broadcast-scored
    # re-join). eager=False: totals' own job materializes it.
    model = model.localCheckpoint(eager=False)
    totals = model.agg(
        F.sum("_raw_c").alias("_raw_n"), F.sum("_tgt_c").alias("_tgt_n")
    )
    bsz = F.lit(float(n_buckets))
    scored = model.crossJoin(F.broadcast(totals)).select(
        "_b",
        (
            F.log((F.col("_tgt_c") + 1.0) / (F.col("_tgt_n") + bsz))
            - F.log((F.col("_raw_c") + 1.0) / (F.col("_raw_n") + bsz))
        ).alias("_diff"),
    )
    return (
        words.join(F.broadcast(scored), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.round(F.sum("_diff"), 4).alias("logw"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    target: Column,
    k: int = 100,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k resampling by importance weight: the k documents
    of the raw corpus whose perturbed log-weight is highest —
    (id, n_words, logw, score) ordered by score desc, id."""
    w = dsir_weights(docs, target, n_buckets, id_col, text_col)
    u = (
        _md5_60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        / F.lit(_TWO60)
    )
    score = F.round(F.col("logw") - F.log(-F.log(u)), 4)
    return (
        w.withColumn("score", score)
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )
