"""Sparse lexical retrieval: BM25 top-k over a document corpus.

Extension operator (no counterpart in the reference — its engine
delegates all querying to chDB and ships no retrieval ranking); in a
training-data pipeline BM25 is the standard primitive for
retrieval-based decontamination (find training docs that *retrieve*
an eval item), contamination forensics, and targeted data selection,
complementing the dense-vector path (operators/similarity.py) with
an exact, vocabulary-grounded ranking.

Scoring is Robertson/Sparck-Jones BM25 (the Lucene idf variant,
always positive)::

    idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    s(d, q) = sum_{t in q}  idf(t) * tf * (k1 + 1)
                            / (tf + k1 * (1 - b + b * dl/avgdl))

Engine-portable determinism (the t26/t27 integer-lane construction):
per-term idf is quantized to integer MICROS (floor(x*1e6 + 0.5) —
HALF_UP, never Python banker's round), the per-(doc, term)
contribution is quantized the same way, and the document score is a
SUM of BIGINTs — order-independent across partitionings and
bit-identical between Spark and DuckDB, so top-k ranks (score_m
DESC, doc_id ASC) are hash-comparable with no float tolerance.
At 1e-6 granularity the quantization is far below any meaningful
ranking distinction.

100 TB shape:
- the corpus is scanned and tokenized exactly ONCE: the pruned
  postings are eagerly localCheckpoint'ed (so ``bm25_topk`` runs a
  job at call time) and the corpus scalars N / total-tokens ride
  that same scan as an ``Observation``, entering the plan as exact
  literals — no second tokenization pass, no scalar cross join;
- the distinct query-term set is broadcast and pruned against the
  exploded token stream map-side, so only (doc, matching-term) rows
  ever shuffle — the corpus' non-matching tokens die at the scan;
- df comes from one aggregate over the terms-sized checkpoint,
  broadcast back;
- candidates shuffle ONCE keyed (query, doc) for the score sum;
- top-k is a per-query rank window, which Catalyst rewrites into a
  PARTIAL WindowGroupLimit before the exchange + a FINAL one after
  (plan-asserted in tests/test_retrieval.py): every map task keeps
  only its local top-k per query, so the per-query reducer sorts
  O(k x partitions) rows, not the full candidate set — the two-stage
  top-k a fat-head query term would otherwise need by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICROS = 1_000_000.0


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
) -> DataFrame:
    """BM25 top-``k`` documents per query.

    ``queries`` is a small frame (query_id, qtext); its distinct
    whitespace terms are broadcast. Repeated terms within one query
    count once (set semantics — the common choice for short queries;
    qtf weighting would multiply the contribution by query term
    count). Returns (query_id, doc_id, score_m, score, rank) with
    ``score_m`` the integer-micros BM25 sum, ``score`` its float
    view, ``rank`` dense 1..k ordered (score_m DESC, doc_id ASC).
    Only documents sharing at least one term with the query appear.

    k1/b arrive as plain literals in BOTH engines' plans — all float
    arithmetic below is (+,-,*,/) on identically-constructed doubles,
    which IEEE754 rounds exactly, so Spark and a SQL replica agree
    bit-for-bit; ln() is quantized immediately (1-ulp libm skew would
    need a value within 1 ulp of a .5 micro boundary to matter).
    """
    from pyspark.sql import Observation

    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_t")
    )
    # Corpus scalars (N docs, total token count) ride the SAME scan
    # that builds the postings: an Observation on the token stream
    # collects them as a side effect of the eager localCheckpoint
    # below, so the corpus is scanned and tokenized exactly ONCE
    # (r8 verdict: the old stats aggregate was a second full
    # tokenization pass — at 100 TB that doubles the scan cost).
    obs = Observation()
    toks = toks.observe(
        obs, F.count(F.lit(1)).alias("_n"), F.sum(F.size("_t")).alias("_tot")
    )
    qterms = (
        queries.select(
            F.col(qid_col),
            F.explode(F.split(F.col(qtext_col), " ")).alias("_term"),
        )
        .filter(F.col("_term") != "")
        .distinct()
        # r10 (guide §2.4 via the §4 lazy-guard pattern): the query
        # side feeds TWO consumers — the broadcast term filter inside
        # the postings build and the scored re-attach — and `queries`
        # is typically derived from the corpus scan itself (t53 slices
        # every 125th document), so without this the corpus was
        # scanned once per consumer. The (query, term) frame is tiny;
        # materialize it lazily once and derive `terms` from it.
        .localCheckpoint(eager=False)
    )
    # postings restricted to query terms: a broadcast LEFT SEMI join
    # prunes the exploded stream map-side. Semi, not inner-on-distinct
    # (r10): the build side may hold a term once per query, and a semi
    # join never duplicates probe rows, so the separate
    # distinct-terms shuffle + broadcast build the r9 shape paid is
    # gone — the checkpointed (query, term) frame broadcasts directly.
    postings = (
        toks.select(
            F.col(id_col),
            F.size("_t").alias("_dl"),
            F.explode("_t").alias("_term"),
        )
        .filter(F.col("_term") != "")
        .join(F.broadcast(qterms.select("_term")), "_term", "left_semi")
        .groupBy(id_col, "_term", "_dl")
        .agg(F.count(F.lit(1)).alias("_tf"))
        # the ONE corpus pass; dfreq and the scored join below both
        # read this query-terms-sized checkpoint, never the corpus
        .localCheckpoint(eager=True)
    )
    try:
        m = obs.get
    except Exception:
        # an EMPTY broadcast term set lets AQE empty-relation
        # propagation prune the probe subtree (metrics node included)
        # before it runs; the result is empty regardless, so the
        # scalar values below are never observable
        m = {}
    n_docs = int(m.get("_n") or 0)
    tot_toks = int(m.get("_tot") or 0) or 1
    # exact literals, same arithmetic as before: _dl*N exact in int64,
    # cast double (exact < 2^53), double division — bit-identical to
    # the SQL replica's (_dl * _n)::DOUBLE / _tot.
    # r10: document frequency is a count().over(partitionBy(term))
    # window on the checkpointed postings — the r9 shape aggregated a
    # separate dfreq frame and broadcast-joined it back, which cost a
    # shuffle job + a broadcast-build job per run for values the
    # postings partition already holds (postings is one row per
    # (doc, term), so rows-per-term IS the df). Same longs, same idf.
    idf_m = F.floor(
        F.log(
            (F.lit(n_docs).cast("long") - F.col("_df") + F.lit(0.5))
            / (F.col("_df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * F.lit(MICROS)
        + F.lit(0.5)
    )
    tfn = (F.col("_tf") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("_tf")
        + F.lit(k1)
        * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b)
            * (
                (F.col("_dl").cast("long") * F.lit(n_docs).cast("long")).cast(
                    "double"
                )
                / F.lit(tot_toks).cast("long")
            )
        )
    )
    contrib = F.floor(idf_m * tfn + F.lit(0.5)).cast("long")
    # The (qid, doc) agg exchange stays distinct from the rank
    # window's qid exchange ON PURPOSE: a single repartition(qid)
    # would satisfy both, but it funnels every candidate of a query
    # through one task (skew at scale) and defeats the Partial
    # WindowGroupLimit that prunes to top-k per partition before the
    # second (tiny) exchange — measured-shape property pinned by
    # tests/test_retrieval.py::test_topk_is_two_stage_group_limit.
    scored = (
        postings.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("_term"))
        )
        .join(F.broadcast(qterms), "_term")
        .groupBy(qid_col, id_col)
        .agg(F.sum(contrib).alias("score_m"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score_m").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            qid_col,
            id_col,
            "score_m",
            (F.col("score_m") / F.lit(MICROS)).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 10,
    min_score: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    max_query_tokens: int = 32,
) -> DataFrame:
    """Retrieval-based decontamination: each eval document becomes a
    BM25 query (its first ``max_query_tokens`` tokens) against the
    training corpus; every training doc retrieved in an eval item's
    top-``k`` with score above ``min_score`` is a contamination
    suspect. Complements the n-gram screens (text.py::
    contamination_flags / fuzzy_contamination): BM25 catches
    paraphrased or partially-overlapping leakage that exact-gram
    matching misses, ranked by lexical evidence.

    Returns one row per suspect training doc: (id, best_eval_id,
    best_score_m, n_eval_hits) — deterministic (max score, ties to
    the smallest eval id). Same scale shape as bm25_topk: eval
    vocabulary broadcast, postings-sized shuffles only.
    """
    q = eval_docs.select(
        F.col(eval_id_col).alias("query_id"),
        F.array_join(
            F.slice(F.split(F.col(eval_text_col), " "), 1, max_query_tokens),
            " ",
        ).alias("qtext"),
    )
    hits = bm25_topk(
        train, q, k=k, id_col=id_col, text_col=text_col
    ).filter(F.col("score") >= min_score)
    # rank window, not a negate-the-id struct max: eval ids may be
    # strings, where negation can't express the min-id tie-break
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_m").desc(), F.col("query_id")
    )
    return (
        hits.withColumn(
            "n_eval_hits",
            F.count(F.lit(1)).over(Window.partitionBy(id_col)),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("query_id").alias("best_eval_id"),
            F.col("score_m").alias("best_score_m"),
            "n_eval_hits",
        )
    )
