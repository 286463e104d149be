"""Text-analysis operators for training-data pipelines (SURVEY §7 G).

All pure DataFrame expressions (codegen'd, no UDF):

- ``token_stats`` — whitespace tokens + a BPE-ish regex token count.
- ``quality_score`` — composite of length, punctuation ratio,
  stopword ratio, mean word length (the C4/Gopher-style signals).
- ``lang_id`` — char-trigram Naive Bayes language ID (broadcast-join
  scoring; model in ``langid_model.py``).
- ``doc_fingerprint`` — md5 + rolling-polynomial hash of normalized
  content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized

_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is"]

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.split(normalized(text), " ")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    ws_tokens = F.size(tokens(t))
    bpe_tokens = F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), 0))
    return docs.select(
        F.col(id_col),
        ws_tokens.alias("n_tokens_ws"),
        bpe_tokens.alias("n_tokens_bpe"),
        F.length(t).alias("n_chars"),
    )


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality signals + a [0,1] heuristic composite + the TRAINED
    classifier's decision (r8 — the last heuristic-weights operator
    graduated, following lang_id's r7 pattern).

    ``model_score_m`` / ``model_keep`` come from the logistic model in
    ``quality_model.py``: integer-quantized features × integer weights
    = a pure BIGINT dot product evaluated inline in whole-stage
    codegen (score_m ≈ logit × 10⁶; keep ⇔ p > 0.5). No join, no UDF,
    no shuffle — the model IS four literal multiply-adds, and the
    integer arithmetic keeps the DuckDB oracle bit-identical.

    Token array is materialized once per row (staged projection);
    the signals below reference it ~5× and split+normalize is not
    free at corpus scale.
    """
    docs = docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("_toks")
    )
    return docs.select(F.col(id_col), *quality_cols(text_col))


def quality_cols(text_col: str = "text") -> list:
    """The quality_score output columns as expressions over a STAGED
    frame carrying ``text_col`` and ``_toks`` (= ``tokens(text)``).
    Exposed so a caller computing several per-doc projections (t27)
    can fuse them into ONE zero-shuffle select instead of 1:1-joining
    the operators on the id — same expressions, same values."""
    from .quality_model import TOK_CAP, train

    mb, mw = train()
    t = F.col(text_col)
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_char = F.length(t)
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*_STOPWORDS)))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    mean_word = _ratio(
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double"), n_tok
    )
    stop_ratio = _ratio(stop_hits, n_tok)
    punct_ratio = _ratio(punct, n_char)
    # composite: enough tokens, some stopwords, sane word lengths
    score = (
        F.least(_ratio(n_tok, F.lit(100)), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + F.when((mean_word >= 3) & (mean_word <= 10), 0.3).otherwise(0.0)
    )
    # trained model: integer-quantized features (quality_model.features
    # mirrors these expressions character-for-character)
    f_len = F.least(n_tok, F.lit(TOK_CAP)).cast("long")
    f_stop = F.round(stop_ratio * 10000).cast("long")
    f_punct = F.round(punct_ratio * 10000).cast("long")
    f_mwl = F.round(mean_word * 10000).cast("long")
    model_score = (
        F.lit(mb).cast("long")
        + F.lit(mw[0]) * f_len
        + F.lit(mw[1]) * f_stop
        + F.lit(mw[2]) * f_punct
        + F.lit(mw[3]) * f_mwl
    )
    return [
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(mean_word, 4).alias("mean_word_len"),
        F.round(score, 4).alias("quality"),
        model_score.alias("model_score_m"),
        (model_score > 0).alias("model_keep"),
    ]


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher rule-based quality filters (Rae et al. 2021, arXiv:
    2112.11446 §A1.1 — the public filter set most curation pipelines
    start from), each as its own boolean so downstream can audit which
    rule fired:

      r_wordcount  — 50 ≤ words ≤ 100,000
      r_meanword   — mean word length in [3, 10]
      r_alpha      — ≥ 80% of words contain an alphabetic character
      r_symbol     — symbol-to-word ratio ≤ 0.1 ('#' chars and
                     ellipses '…'/'...')
      r_bullet     — ≤ 90% of lines start with a bullet ('-','*','•')
      r_ellipsis   — ≤ 30% of lines end with an ellipsis
      r_stopwords  — ≥ 2 DISTINCT members of Gopher's 8-stopword set
      gopher_pass  — AND of all rules

    Pure whole-stage codegen (splits, higher-order filters, integer
    counts, double ratios) — zero shuffle, zero UDF; every comparison
    is exact-replicable by the DuckDB oracle (t27 ride-along).
    """
    t = F.col(text_col)
    d = docs.select(
        F.col(id_col),
        t,
        tokens(t).alias("_toks"),
        F.split(t, "\n").alias("_lines"),
    )
    return d.select(F.col(id_col), *gopher_cols(text_col))


def gopher_cols(text_col: str = "text") -> list:
    """The gopher_rules output columns as expressions over a STAGED
    frame carrying ``text_col``, ``_toks`` (= ``tokens(text)``) and
    ``_lines`` (= ``split(text, '\\n')``) — the fusion hook t27 uses
    (see ``quality_cols``)."""
    _GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
    toks = F.col("_toks")
    lines = F.col("_lines")
    n_tok = F.size(toks)
    n_lines = F.size(lines)
    mean_word = _ratio(
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast(
            "double"
        ),
        n_tok,
    )
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    hashes = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    # ellipses: unicode … plus literal three-dot runs (each '...'
    # counted once — regexp_count of the non-overlapping scan)
    ellipses = F.regexp_count(
        F.col(text_col), F.lit(r"\.\.\.")
    ) + F.regexp_count(F.col(text_col), F.lit("…"))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.trim(l), 1, 1).isin("-", "*", "•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),
        )
    )
    stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
        )
    )
    r_wordcount = (n_tok >= 50) & (n_tok <= 100_000)
    r_meanword = (mean_word >= 3) & (mean_word <= 10)
    r_alpha = _ratio(alpha_words, n_tok) >= 0.8
    r_symbol = _ratio(hashes + ellipses, n_tok) <= 0.1
    r_bullet = _ratio(bullet_lines, n_lines) <= 0.9
    r_ellipsis = _ratio(ellipsis_lines, n_lines) <= 0.3
    r_stop = stop_distinct >= 2
    return [
        r_wordcount.alias("r_wordcount"),
        r_meanword.alias("r_meanword"),
        r_alpha.alias("r_alpha"),
        r_symbol.alias("r_symbol"),
        r_bullet.alias("r_bullet"),
        r_ellipsis.alias("r_ellipsis"),
        r_stop.alias("r_stopwords"),
        (
            r_wordcount
            & r_meanword
            & r_alpha
            & r_symbol
            & r_bullet
            & r_ellipsis
            & r_stop
        ).alias("gopher_pass"),
    ]


def lang_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Char-trigram Naive Bayes language ID (r7 — the real algorithm,
    replacing the r1-r6 marker-word heuristic).

    Model: per-language Laplace-smoothed trigram log-likelihoods as
    integer milli-log10 weights, trained at import on the embedded
    seed corpus (operators/langid_model.py). Plan: explode doc
    trigrams → broadcast-join the ~1.5k-row model → ONE shuffle on
    ``id_col`` with per-language conditional sums (pivot) → argmax
    with a deterministic tie-break (score DESC, lang ASC). Documents
    matching no vocab trigram → 'und'; CJK script overrides to 'zh'.
    Integer weights keep the DuckDB oracle bit-identical.

    ``carry_cols`` (r9): extra ``docs`` columns projected through the
    operator's own 1:1 scores re-attach (``id_col`` is unique by
    contract), so callers that need doc attributes next to
    ``lang_pred`` don't pay a second corpus scan + shuffle join to
    get them back.
    """
    from ..localdf import local_df
    from .langid_model import LANGS, train

    # carry_cols colliding with operator internals would surface as an
    # ambiguous/duplicate-column analysis error deep in the plan; fail
    # at the call site instead (ADVICE r9)
    reserved = {id_col, "lang_pred", "_zh"} | {f"_s_{lang}" for lang in LANGS}
    bad = [c for c in (carry_cols or []) if c in reserved]
    if bad:
        raise ValueError(
            f"lang_id carry_cols collide with operator internals: {bad}"
        )

    spark = docs.sparkSession
    model = local_df(spark, train(), "gram string, lang_m string, w long")
    t = F.col(text_col)
    # normalization must mirror langid_model.normalize (and the oracle)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^\p{L} ]", " "), " +", " "
        )
    )
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))
    # r9: `_zh` (one boolean) replaces carrying the raw text through
    # the scores join — the re-attach exchange/sort now moves
    # (id, bool) instead of document bodies (guide §2.3: shuffle
    # keys/flags, not payloads).
    carry = [F.col(c) for c in (carry_cols or [])]
    d = docs.select(F.col(id_col), (cjk > 0).alias("_zh"), *carry)
    # r9: split the normalized text into its char array ONCE and build
    # each trigram from three O(1) element_at lookups — the previous
    # per-gram substring(_norm, i, 3) re-scans the string's bytes to
    # find codepoint i every call (UTF8String seeks are O(i)), i.e.
    # O(len²) byte work per doc. Output grams are identical
    # (plan-diffed to 0 rows; extraction stage 1.73→1.22 s at sf0.1).
    grams = docs.select(
        F.col(id_col), F.split(norm, "").alias("_ch")
    ).select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_ch") >= 3,
                F.expr(
                    "transform(sequence(1, size(_ch) - 2), "
                    "i -> concat(element_at(_ch, i), "
                    "element_at(_ch, i + 1), element_at(_ch, i + 2)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    scores = (
        grams.join(F.broadcast(model), "gram")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.when(F.col("lang_m") == lang, F.col("w"))).alias(
                    f"_s_{lang}"
                )
                for lang in LANGS
            ]
        )
    )
    # vocab x lang is a complete cross, so one matched gram fills all
    # language scores; null score means zero matches -> 'und'
    s = {lang: F.col(f"_s_{lang}") for lang in LANGS}
    argmax = F.lit(None).cast("string")
    for lang in reversed(LANGS):  # earlier langs win ties -> apply last
        cond = None
        for other in LANGS:
            if other == lang:
                continue
            ge = s[lang] >= s[other]
            cond = ge if cond is None else (cond & ge)
        argmax = F.when(cond, lang).otherwise(argmax)
    pred = (
        F.when(F.col("_zh"), "zh")
        .when(s[LANGS[0]].isNull(), "und")
        .otherwise(argmax)
    )
    return d.join(scores, id_col, "left").select(
        F.col(id_col),
        pred.alias("lang_pred"),
        *[F.col(c) for c in (carry_cols or [])],
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """md5 + 64-bit rolling polynomial hash of normalized content.

    The rolling hash is an aggregate over characters (base-31 mod
    2^64 via long overflow) — deterministic, order-sensitive, cheap.
    """
    norm = normalized(F.col(text_col))
    chars = F.split(norm, "")
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: acc * F.lit(31).cast("long") + F.coalesce(F.ascii(c), F.lit(0)),
    )
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("md5"),
        rolling.alias("rolling64"),
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document (SURVEY §7 G text analysis).

    Plan shape (the 100 TB story): explode tokens → per-(doc, term)
    counts (one shuffle on (doc, term)) → document frequencies per
    term (one shuffle on term) → join back ON term → per-doc top-k
    via window. idf = ln(N / df); score = tf * idf, rounded for
    oracle parity.

    Scale notes: the tf⋈df join carries NO broadcast hint — at 100 TB
    the distinct-term table is itself huge (an unconditional broadcast
    is a driver/executor OOM), both sides are already keyed by term,
    and AQE still elects a broadcast when df_ turns out small. N rides
    along as a 1-row broadcast cross join instead of a separate
    ``docs.count()`` job.
    """
    from pyspark.sql import Window

    ndf = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    # NO tf-table checkpoint (r10, reverting the r9 §2 trade): tf
    # feeds both the document-frequency aggregate and the score join,
    # and materializing it once LOOKS like it saves a pass — but the
    # (doc, term, tf) frame is corpus-sized, and writing + re-reading
    # it costs more than recomputing the explode + partial aggregate
    # from the compact parquet scan. Measured at 10M docs, interleaved
    # both orders: checkpoint-on 242.8/435.6 s vs checkpoint-off
    # 178.2/303.8 s (−26%, pairwise consistent); the driver's r9 bench
    # showed the same direction at sf0.1 (−15%). Same lesson as the
    # t08 gram-frame rejection: only checkpoint frames that are SMALL
    # relative to their recompute cost.
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(ndf)).select(
        id_col,
        "term",
        "tf",
        F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(id_col, "term", "tf", "score", "rk")
    )


def repetition_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Gopher-style within-document repetition signal: the fraction of
    duplicate word n-grams, ``1 - distinct / total`` (0 for docs with
    fewer than *n* tokens). High values flag boilerplate/generated
    text; one of the standard pretraining-corpus filters.

    Pure codegen'd expressions over a materialized token array — the
    n-gram list is built once per row, no shuffle, no UDF.
    """
    docs = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    total = n_tok - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    ratio = F.when(
        n_tok >= n,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        F.round(ratio, 4).alias("rep_ratio"),
    )


def sample_per_key(
    docs,
    key_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
    a: int = 48271,
    m: int = 2147483647,
):
    """Deterministic stratified sample: the k "randomly" ranked rows
    per key, where rank order is the Lehmer multiplicative hash
    ``(id * a) % m`` — stable across engines and runs (no RNG state),
    so a training-data subsample is reproducible and oracle-checkable.
    One window per key partition: a single shuffle on the strata key;
    skewed strata are bounded by k on output, and the Lehmer constants
    keep the product under 2^63 for ids < 2^47.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    h = (F.col(id_col) * F.lit(a)) % F.lit(m)
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def contamination_flags(
    docs,
    eval_docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
):
    """Benchmark-contamination screen: flag every training document
    that shares at least one n-token contiguous span with any document
    in ``eval_docs`` (the decontamination rule used for LLM training
    corpora; n≈8..13 word-grams is the common setting).

    Scale shape: the eval set is the small side — its distinct
    n-grams broadcast; the corpus explodes its n-grams map-side and
    LEFT SEMI broadcast-joins, so the corpus never shuffles and the
    output is just the flagged id set. Returns (id_col, n_hits) with
    n_hits = number of distinct contaminated n-grams per doc.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import _tokens_of, shingles_of_tokens

    # Materialize the token array in its own projection BEFORE the
    # higher-order shingle lambda (the _tokens_of discipline): an
    # inlined split(regexp_replace(...)) re-evaluates once per gram
    # inside transform() — O(tokens²) regex work per doc, measured 3.3s
    # -> 0.1s on the sf0.1 corpus explode.
    def grams(df):
        return _tokens_of(df, id_col, text_col).select(
            F.col(id_col),
            F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("_g"),
        )

    eval_grams = (
        _tokens_of(eval_docs, id_col, text_col)
        .select(F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("_g"))
        .distinct()
    )
    # Dense integer id per distinct eval gram (bijective within the
    # run), attached via broadcast inner join: the count-distinct
    # shuffle then carries (doc_id, int64) instead of (doc_id,
    # n-token string) — same exact n_hits, ~10x narrower exchange on
    # corpora with heavy span overlap (t34 was the heaviest bench
    # entry before this). eval_grams is distinct, so the inner join
    # keeps exactly the semi-join's row multiplicity.
    eval_ids = eval_grams.withColumn("_gid", F.monotonically_increasing_id())
    return (
        grams(docs)
        .join(F.broadcast(eval_ids), "_g", "inner")
        .groupBy(id_col)
        .agg(F.count_distinct("_gid").alias("n_hits"))
    )


# PII category -> (pattern, replacement token, guard char). Patterns
# restrict themselves to syntax Java regex and RE2 (DuckDB) interpret
# identically — no lookaround, no backreferences — so the DuckDB
# conformance oracle runs the very same expressions. Scrub applies
# them in THIS order (emails first: their local parts can contain
# digit runs the later numeric patterns would otherwise clip).
#
# The guard char short-circuits the regex behind a memchr-speed
# instr(): the email pattern's leading word-char run backtracks
# catastrophically on text without '@' (measured 20s -> 2.7s for a
# 1M-doc scan, which is scan-bound after the guard). A guard is
# sound iff every possible match contains the char — '@' for emails,
# '-' for SSNs; phone/IP separators vary, so they run unguarded
# (their leading \(?\d / \d fails fast at non-digit positions).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>",
     "@"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>", "-"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>", None),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>", None),
]


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII hit counts (emails, SSNs, phone numbers,
    IPv4 addresses) — the triage pass of a training-data PII policy.

    Pure codegen (`regexp_count`), zero Python, zero shuffle: the
    scan is embarrassingly parallel and runs at parquet-scan speed at
    any corpus size. Returns (id, n_email, n_ssn, n_phone, n_ipv4,
    pii_total).
    """
    out = docs.select(F.col(id_col), *_pii_count_cols(text_col))
    total = None
    for name, _p, _t, _g in PII_PATTERNS:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    return out.withColumn("pii_total", total.cast("int"))


def _pii_count_cols(text_col: str) -> list:
    counts = []
    for name, pat, _tok, guard in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        if guard is not None:
            c = F.when(F.instr(F.col(text_col), guard) > 0, c).otherwise(
                F.lit(0)
            )
        counts.append(c.alias(f"n_{name}"))
    return counts


def _pii_scrub_col(text_col: str):
    c = F.col(text_col)
    for _name, pat, tok, guard in PII_PATTERNS:
        repl = F.regexp_replace(c, pat, tok)
        if guard is not None:
            repl = F.when(F.instr(c, guard) > 0, repl).otherwise(c)
        c = repl
    return c.alias("clean_text")


def pii_audit(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub + scan in ONE projection: (id, clean_text, n_email,
    n_ssn, n_phone, n_ipv4, pii_total) — the production redaction
    shape, where the release pipeline wants the redacted text AND the
    audit counts of what was removed from a single pass over the
    corpus (each doc's text decompresses once, each regex runs once
    per purpose). Zero shuffle, pure codegen, like its two halves.
    """
    out = docs.select(
        F.col(id_col), _pii_scrub_col(text_col), *_pii_count_cols(text_col)
    )
    total = None
    for name, _p, _t, _g in PII_PATTERNS:
        col = F.col(f"n_{name}")
        total = col if total is None else total + col
    return out.withColumn("pii_total", total.cast("int"))


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Replace detected PII spans with placeholder tokens
    (``<EMAIL>``/``<SSN>``/``<PHONE>``/``<IP>``), the standard
    redaction step before corpus release.

    Same narrow, codegen-only shape as ``pii_scan``; category order
    is fixed (module constant) so results are reproducible across
    engines. Returns (id, clean_text).
    """
    return docs.select(F.col(id_col), _pii_scrub_col(text_col))


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean log-likelihood under a bigram LM trained on
    the corpus itself — the classic KenLM-style perplexity filter
    (CCNet) with the model estimation folded into the same job.

    Stages, all built-in expressions (no Python in the hot path):

    1. bigram extraction: ``arrays_zip(slice(t,1,n-1), slice(t,2,n-1))``
       exploded — narrow, whole-stage codegen.
    2. LM estimation: ``GROUP BY (w1, w2)`` counts (the only shuffle
       proportional to corpus bigrams), conditional probability via a
       window sum over ``w1`` on the already-aggregated count table
       (O(distinct bigrams), tiny vs corpus).
    3. scoring: doc bigrams re-join the probability table on
       (w1, w2); the LM side is orders of magnitude smaller than the
       corpus, so AQE elects a broadcast below the threshold — at
       100 TB the LM table for a capped vocabulary still fits the
       broadcast budget after pruning rare bigrams upstream.

    Tokenization is a plain single-space split (the corpus is
    pre-normalized; callers with raw text should normalize first),
    chosen so a SQL oracle (string_split) computes the identical
    model. Docs with <2 tokens have no bigrams and drop out, like
    the oracle's inner join.

    Returns (id, lm_score = round(avg(ln p), 4), n_bigrams).
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_t"))
    staged = toks.select(
        F.col(id_col),
        F.slice("_t", 1, F.size("_t") - 1).alias("_a"),
        F.expr("slice(_t, 2, size(_t) - 1)").alias("_b"),
    )
    pairs = staged.select(
        F.col(id_col), F.explode(F.arrays_zip("_a", "_b")).alias("_p")
    ).select(F.col(id_col), F.col("_p._a").alias("w1"), F.col("_p._b").alias("w2"))
    # pairs feeds the LM estimation AND the scoring join — without
    # materialization the split+zip+explode pipeline runs once per
    # consumer (same checkpoint-the-intermediate pattern as minhash/
    # simhash signatures; at full scale the exploded bigrams would be
    # a written column table instead). localCheckpoint, not persist():
    # the returned frame is lazy so an unpersist can't happen, and a
    # long-lived serving session would pin one cached bigram table per
    # call (the r7 minhash sig leak class); checkpoint blocks free on
    # GC via the ContextCleaner.
    pairs = pairs.localCheckpoint(eager=True)
    cnt = pairs.groupBy("w1", "w2").agg(F.count("*").alias("_c"))
    prob = cnt.select(
        "w1",
        "w2",
        (F.col("_c") / F.sum("_c").over(Window.partitionBy("w1"))).alias("_p"),
    )
    return (
        pairs.join(prob, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.avg(F.log("_p")), 4).alias("lm_score"),
            F.count("*").alias("n_bigrams"),
        )
    )


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """Sub-document exact dedup: split each document into fixed-size
    token chunks, keep only the globally-first occurrence of every
    distinct chunk (ordered by (doc, chunk index)), and reassemble —
    the line/paragraph-level dedup step of CCNet/Gopher-style
    pipelines, expressed at token-chunk granularity because the
    corpus has no line structure.

    Plan: chunking is a narrow transform+slice; the first-occurrence
    pick is ONE shuffle keyed on chunk text (row_number over the
    chunk partition); reassembly is one shuffle back on the doc id.
    At 100 TB the occurrence pick would key on a chunk fingerprint
    (xxhash64) with the text carried only through the reassembly —
    here the text IS the key so a SQL oracle reproduces it exactly
    (same trade as ``exact_dedup``'s documented fingerprint lane).

    Returns (id, n_chunks, n_kept, kept_text); a document whose every
    chunk lost the race drops out (matches the oracle's group-by).
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_t"))
    nch = F.ceil(F.size("_t") / F.lit(chunk_tokens)).cast("int")
    chunks = toks.select(
        F.col(id_col),
        nch.alias("_n"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.array_join(
                    F.slice("_t", i * chunk_tokens + 1, chunk_tokens), " "
                ),
            )
        ).alias("idx", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy(id_col, "idx")
    kept = chunks.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return kept.groupBy(id_col).agg(
        F.first("_n").alias("n_chunks"),
        F.count("*").cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    strata_col: str = "source",
) -> DataFrame:
    """Deterministic concat-and-chunk sequence packing: within each
    stratum, documents are laid end-to-end in ``id_col`` order and
    cut into ``seq_len``-token training sequences; each document is
    assigned to the bin where it starts.

    This is the greedy packing every LLM pre-training loader runs;
    making it a relational window (cumulative token count → bin =
    floor(offset / seq_len)) keeps it ONE shuffle on the stratum key
    and reproducible across engines — no RNG, no driver loop. Skewed
    strata at 100 TB split naturally because the window partitions by
    stratum only once and the output is pre-aggregated per bin.

    Returns (stratum, bin, n_docs, bin_tokens).
    """
    from pyspark.sql import Window

    d = docs.select(
        F.col(strata_col),
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("_tok"),
    )
    w = Window.partitionBy(strata_col).orderBy(id_col)
    d = d.withColumn("_off", F.sum("_tok").over(w) - F.col("_tok"))
    return (
        d.withColumn("bin", F.floor(F.col("_off") / F.lit(seq_len)))
        .groupBy(strata_col, "bin")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("_tok").alias("bin_tokens"),
        )
    )


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    top_ranks: int = 1000,
    extra_aggs: list | None = None,
) -> DataFrame:
    """Corpus-level statistics a training-data pipeline reports per
    snapshot: document count, token count, vocabulary size,
    type-token ratio, and the Zipf exponent (OLS slope of log
    frequency against log rank over the ``top_ranks`` most frequent
    tokens — natural language sits near -1; strong deviation flags
    boilerplate or synthetic text).

    Plan shape: tokenize → explode → two-phase frequency count (the
    ONE data-sized shuffle, keyed on token); the vocabulary-sized
    frequency table is materialized once (lazy localCheckpoint) so
    the corpus-sized tokenize pipeline does NOT re-execute under the
    totals branch and the top-K branch; the rank window runs over
    only the top-K rows after a TakeOrdered, so the global sort
    touches K rows, never the vocabulary; the regression is a single
    1-row aggregate over K points. All corpus-sized stages stay in
    whole-stage codegen; driver sees 1-row results only.

    *extra_aggs*: optional aliased aggregate Columns over *docs* that
    ride the operator's own doc-count scan (r9: t45's normalized-md5
    COUNT DISTINCT — same expressions, same engine, one fewer full
    pass over the corpus); their columns are appended after
    ``zipf_slope``.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint(eager=False)
    )
    totals = freq.agg(
        F.sum("f").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    )
    top = (
        freq.orderBy(F.desc("f"), "token")
        .limit(top_ranks)
        .select(
            "f",
            F.row_number()
            .over(Window.orderBy(F.desc("f"), "token"))
            .alias("r"),
        )
    )
    slope = top.agg(
        F.round(F.regr_slope(F.log("f"), F.log("r")), 4).alias("zipf_slope")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"), *(extra_aggs or []))
    extra_names = n_docs.columns[1:]
    return (
        n_docs.crossJoin(totals)
        .crossJoin(slope)
        .select(
            "n_docs",
            "total_tokens",
            "vocab_size",
            F.round(
                F.col("vocab_size") * F.lit(1.0) / F.col("total_tokens"), 6
            ).alias("ttr"),
            "zipf_slope",
            *extra_names,
        )
    )


def fuzzy_contamination(
    docs,
    eval_docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    threshold: float = 0.05,
):
    """Near-duplicate decontamination: flag a training document when
    the Jaccard similarity between its DISTINCT word n-gram set and
    ANY eval document's reaches ``threshold`` — the fuzzy tier behind
    ``contamination_flags``' exact-span screen (catches paraphrased /
    partially-overlapping benchmark leakage that no single shared
    span reveals). Returns (id_col, max_jaccard) for flagged docs.

    Scale shape: the eval set is the small side — its exploded
    distinct grams (with per-doc set sizes) broadcast; the corpus
    explodes its distinct grams map-side and inner-broadcast-joins,
    so bodies never shuffle and the only exchange carries
    ((train_id, eval_id), counts). Jaccard = inter / (|A|+|B|-inter)
    with |A| carried as a per-row scalar and |B| arriving on the
    broadcast side.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import _tokens_of, shingles_of_tokens

    # explode ONLY — shingles_of_tokens already dedups, and putting a
    # second consumer (size()) next to the explode re-inlines the
    # whole shingle lambda into every reference (measured 0.5s -> 6-8s
    # on the sf0.1 corpus); per-doc set sizes come from a count over
    # the exploded grams instead (a (doc_id, int64) shuffle)
    def grams(df, out_id):
        return _tokens_of(df, id_col, text_col).select(
            F.col(id_col).alias(out_id),
            F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("_g"),
        )

    tr_g = grams(docs, id_col)
    # r9: the per-doc set size is size(shingle array) in a map-side
    # projection — the previous explode → groupBy(doc) pass re-ran the
    # whole corpus gram pipeline a second time AND exchanged the
    # partial counts. The shingle lambda is the SOLE consumer of its
    # projection here, so the re-inlining trap above doesn't apply;
    # shingles are never empty (short docs yield one truncated gram),
    # so the per-doc row set is identical to the exploded count's.
    na = _tokens_of(docs, id_col, text_col).select(
        F.col(id_col),
        F.size(shingles_of_tokens(F.col("_toks"), n)).cast("long").alias("_na"),
    )
    # r9: ev_g feeds both the per-doc size aggregate and the broadcast
    # join side — without a checkpoint the eval tokenize→shingle
    # pipeline executes once per consumer. The eval gram table is the
    # operator's small side by design, so materializing it is cheap.
    ev_g = grams(eval_docs, "_ev_id").localCheckpoint(eager=False)
    ev_n = ev_g.groupBy("_ev_id").agg(F.count(F.lit(1)).alias("_nb"))
    ev_side = ev_g.join(ev_n, "_ev_id")  # eval side is small; stays broadcast
    inter = (
        tr_g.join(F.broadcast(ev_side), "_g", "inner")
        .groupBy(id_col, "_ev_id")
        .agg(F.count(F.lit(1)).alias("_inter"), F.first("_nb").alias("_nb"))
    )
    jac = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    return (
        inter.join(na, id_col)
        .select(F.col(id_col), jac.alias("_j"))
        .groupBy(id_col)
        .agg(F.round(F.max("_j"), 4).alias("max_jaccard"))
        .filter(F.col("max_jaccard") >= threshold)
    )


def _dup_gram_hits(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int,
    key: str,
):
    """Shared stage of dup_ngram_coverage / scrub_dup_spans: tokenize,
    positional n-grams, and the per-(doc, gram) hit rows
    (id, _cnt occurrences, _poss positions). Returns (toks, grams,
    hits).

    r10 shape (guide §2.3/§2.4): ONE groupBy(gram, doc) aggregates
    occurrence count + position list BEFORE anything is keyed on the
    gram alone, and the distinct-doc duplicate test is a
    count().over(partitionBy(gram)) window on that aggregate — so
    the gram-keyed exchange carries (doc, gram)-distinct rows, not
    occurrences, and there is no dup-set self-join at all. The r9
    shape built a separate distinct→count dup set and joined the
    occurrence stream back to it, which (a) shuffled occurrence-level
    rows by gram and (b) re-executed tokenize+posexplode under BOTH
    branches (different exchange keys, so no ReusedExchange).
    Positions within one document are gram-unique (each position
    starts exactly one n-gram), so flatten(collect_list(_poss))
    downstream reproduces collect_set(_pos) exactly.
    Skew note: a gram duplicated across a huge fraction of documents
    makes one window group large; WindowExec buffers a group in a
    spillable array, so this degrades to a straggler, not an OOM —
    same hot-key behavior as the SMJ the join form would pick.
    """
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_t"))
    total = F.size("_t") - F.lit(n - 1)
    grams = toks.filter(total > 0).select(
        F.col(id_col),
        F.size("_t").alias("_ntok"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), total),
                lambda i: F.array_join(F.slice("_t", i, n), " "),
            )
        ).alias("_pos", "_g"),
    )
    if key == "hash":
        grams = grams.withColumn("_g", F.xxhash64("_g"))
    gdoc = grams.groupBy("_g", id_col).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.collect_list("_pos").alias("_poss"),
    )
    hits = (
        gdoc.withColumn(
            "_nd", F.count(F.lit(1)).over(Window.partitionBy("_g"))
        )
        .filter(F.col("_nd") >= min_docs)
        .select(id_col, "_cnt", "_poss")
    )
    return toks, grams, hits


def dup_ngram_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
    min_docs: int = 2,
    key: str = "text",
    spine=None,
) -> DataFrame:
    """Cross-document duplicated n-gram coverage — the corpus-level
    counterpart of ``repetition_ratio``'s within-document signal and
    the Gopher "fraction of tokens inside duplicated n-grams" filter:
    an n-gram is *duplicated* when it occurs in at least ``min_docs``
    DISTINCT documents; per document we report the fraction of its
    n-grams that are duplicated and the fraction of token positions
    covered by at least one duplicated n-gram. High coverage flags
    templated / mirrored / boilerplate documents that chunk-level
    exact dedup (``chunk_dedup``) misses because no fixed-boundary
    chunk repeats verbatim.

    Plan shape (three keyed exchanges, all on narrow rows):
      1. tokenize → positional n-grams (narrow transform + slice);
      2. distinct-doc count per gram — groupBy(gram, doc) then
         groupBy(gram), both map-side-combinable; only grams that
         reach ``min_docs`` survive the filter, so the join back is
         a semi-shaped inner join on the gram text;
      3. covered token positions per doc — the dup-gram hits reduce
         to (doc, position) int pairs, ONE groupBy(doc) collects the
         distinct positions (bounded by tokens/doc), and the interval
         union |∪ [p, p+n-1]| is a closed-form fold over the sorted
         array: Σ min(gap_to_next, n). No second explode, no global
         distinct — on a worst-case corpus where every gram is
         duplicated this is the difference between shuffling G rows
         and n·G rows. Document bodies never travel after stage 1.
    ``key`` picks the gram key for stages 2-3: ``"text"`` keeps the
    gram string (a SQL oracle reproduces the pipeline exactly — the
    conformance lane), ``"hash"`` replaces it with xxhash64(gram)
    right after tokenization, so every shuffle carries an 8-byte key
    instead of ~n words of text — the 100 TB lane (measured at 10M
    worst-case docs where EVERY gram is duplicated, full operator
    forced: 44.2 → 20.4 GB shuffle, 994 → 598 s, with value-level
    lane fingerprints equal — BENCH_TEXT_10M.json; at 1M the hash
    compute makes it a wash on wall-clock while still halving
    shuffle). Same 64-bit-fingerprint trade as
    ``exact_dedup``'s documented fingerprint lane; a cross-doc
    collision misclassifies one gram in ~2^64.

    Returns (id, n_grams, n_dup_grams, dup_gram_frac, dup_token_frac)
    for every document with at least one n-gram. ``spine`` lets a
    caller that also runs the scrub lane pass one shared
    ``_dup_gram_hits`` result (ideally with ``hits``
    localCheckpoint'ed) so the gram pipeline executes once.
    """
    toks, grams, hits = spine or _dup_gram_hits(
        docs, id_col, text_col, n, min_docs, key
    )
    total = F.size("_t") - F.lit(n - 1)
    # n_grams/_ntok are closed-form per doc — no explode, no shuffle
    per_doc_grams = toks.filter(total > 0).select(
        F.col(id_col),
        total.cast("long").alias("n_grams"),
        F.size("_t").alias("_ntok"),
    )
    # r9: ONE groupBy carries both per-doc lanes (hit count + sorted
    # position set) — previously two aggregates over `hits` meant two
    # exchanges, two joins, and two evaluations of the gram-probe
    # subtree feeding them.
    # r10: hits rows are per (doc, gram) — occurrence count + position
    # list — so the count is a SUM and the position set a flatten of
    # disjoint per-gram lists (positions are gram-unique within a doc).
    ps = F.array_sort(F.flatten(F.collect_list("_poss")))
    dup_stats = (
        hits.groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_dup_grams"),
            ps.alias("_ps"),
        )
        .select(
            F.col(id_col),
            F.col("n_dup_grams"),
            F.aggregate(
                F.transform(
                    F.col("_ps"),
                    # F.get is 0-based and returns NULL past the end in
                    # BOTH ANSI modes (element_at throws under ANSI-on,
                    # the driver's Spark-4 default session).
                    lambda p, i: F.least(
                        F.coalesce(
                            F.get(F.col("_ps"), i + F.lit(1)) - p,
                            F.lit(n),
                        ),
                        F.lit(n),
                    ),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("_ncov"),
        )
    )
    return (
        per_doc_grams.join(dup_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.round(
                F.coalesce("n_dup_grams", F.lit(0)) / F.col("n_grams").cast("double"),
                4,
            ).alias("dup_gram_frac"),
            F.round(
                F.coalesce("_ncov", F.lit(0)) / F.col("_ntok").cast("double"), 4
            ).alias("dup_token_frac"),
        )
    )


def scrub_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
    min_docs: int = 2,
    key: str = "text",
    spine=None,
) -> DataFrame:
    """REMOVE every token covered by a cross-document duplicated
    n-gram — the rewrite counterpart of ``dup_ngram_coverage``'s
    flag (the substring-dedup semantics of Lee et al. 2022,
    arXiv:2107.06499: duplicated spans are excised from the corpus,
    not just scored). Shares the flag operator's stages 1-2 (grams →
    distinct-doc dup set → hits), then per doc:

      sorted dup-gram starts → MERGED covered blocks → the KEPT gaps
      between blocks → the scrubbed text is the gap slices re-joined.

    The block merge is closed-form over the sorted starts array
    (a start opens a block when the previous start is more than n
    away; a start closes one when the next start is), so the rewrite
    is O(|starts|) per row with no position explode, no fold-built
    arrays (the bpe O(len²) landmine) and no per-token membership
    scan. Neighbor access uses 0-based ``F.get`` (NULL out of bounds
    in BOTH ANSI modes — the t31 lesson). Block arrays are staged as
    materialized columns so the per-element lambdas read attributes.

    Returns (id, n_tokens, n_removed_tokens, scrubbed) for every doc
    with at least one n-gram; docs with no duplicated gram come back
    unchanged (n_removed_tokens = 0).

    ``spine``: see ``dup_ngram_coverage`` — one shared
    ``_dup_gram_hits`` result for callers running both lanes.
    """
    toks, grams, hits = spine or _dup_gram_hits(
        docs, id_col, text_col, n, min_docs, key
    )
    # posexplode positions are 0-based; the interval math below is
    # 1-based (token positions 1..T). hits rows are per (doc, gram)
    # with disjoint position lists (r10), so the flatten has no dups.
    ps_f = hits.groupBy(id_col).agg(
        F.array_sort(
            F.transform(
                F.flatten(F.collect_list("_poss")), lambda p: p + 1
            )
        ).alias("_ps")
    )
    base = (
        toks.filter(F.size("_t") - F.lit(n - 1) > 0)
        .join(ps_f, id_col, "left")
        .select(
            F.col(id_col),
            "_t",
            F.coalesce("_ps", F.array().cast("array<int>")).alias("_ps2"),
        )
    )
    ps = F.col("_ps2")
    L = F.size(ps)
    T = F.size("_t")
    idx = F.when(L > 0, F.sequence(F.lit(1), L)).otherwise(
        F.array().cast("array<int>")
    )
    # block starts: ps[i] where i == 1 or ps[i] - ps[i-1] > n
    # (get(ps, -1) is NULL, so the i == 1 disjunct carries the edge)
    s_vals = F.transform(
        F.filter(
            idx,
            lambda i: (i == 1) | (F.get(ps, i - 1) - F.get(ps, i - 2) > n),
        ),
        lambda i: F.get(ps, i - 1),
    )
    # block ends: min(ps[i] + n - 1, T) where i == L or ps[i+1] - ps[i] > n
    e_vals = F.transform(
        F.filter(
            idx,
            lambda i: (i == L) | (F.get(ps, i) - F.get(ps, i - 1) > n),
        ),
        lambda i: F.least(F.get(ps, i - 1) + F.lit(n - 1), T),
    )
    staged = base.select(
        F.col(id_col), "_t", s_vals.alias("_S"), e_vals.alias("_E")
    )
    S, E = F.col("_S"), F.col("_E")
    B = F.size(S)
    gap_start = lambda j: F.when(j == 0, F.lit(1)).otherwise(  # noqa: E731
        F.get(E, j - 1) + 1
    )
    gap_end = lambda j: F.when(j == B, F.size("_t")).otherwise(  # noqa: E731
        F.get(S, j) - 1
    )
    kept = F.flatten(
        F.transform(
            F.sequence(F.lit(0), B),
            lambda j: F.slice(
                "_t",
                gap_start(j),
                F.greatest(gap_end(j) - gap_start(j) + 1, F.lit(0)),
            ),
        )
    )
    return staged.select(
        F.col(id_col),
        F.size("_t").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).cast("long").alias("n_removed_tokens"),
        F.array_join(kept, " ").alias("scrubbed"),
    )


def rewrite_scrubbed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 6,
    min_docs: int = 2,
    key: str = "text",
) -> DataFrame:
    """The scrubbed CORPUS: ``docs`` with ``text_col`` replaced by
    ``scrub_dup_spans``' rewrite, all other columns preserved. Docs
    the scrub never touched (shorter than ``n`` tokens, or no
    duplicated gram) pass through byte-identical — including
    empty/NULL originals; only docs the scrub reduced TO empty (every
    token under a duplicated span) are dropped. One body-sized
    doc-keyed join — the rewrite's irreducible shuffle.

    Shared by the engine's ``rewriteScrub(...)`` SQL table function
    and tools/bench_pipeline_scale.py's funnel stage.
    """
    scr = scrub_dup_spans(docs, id_col, text_col, n, min_docs, key)
    return (
        docs.join(scr.select(id_col, "scrubbed"), id_col, "left")
        .filter(F.col("scrubbed").isNull() | (F.col("scrubbed") != ""))
        .withColumn(text_col, F.coalesce("scrubbed", F.col(text_col)))
        .drop("scrubbed")
    )


def mix_sample(
    docs: DataFrame,
    weights: dict,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "mix",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
) -> DataFrame:
    """Deterministic weighted mixture sampling + train/val/test split
    — the step that turns a filtered corpus into a training mix: each
    source is downsampled to its configured rate and surviving
    documents are assigned to train/val/test, all by salted md5 of
    the document id, so the mix is reproducible across engines, runs
    and cluster sizes (no RNG state, no sort order dependence — the
    properties a 100 TB pipeline needs for resumable ingestion).

    ``weights`` maps source → keep-rate in [0, 1]; unlisted sources
    keep everything. The keep decision uses the top 60 bits of
    md5(salt ‖ ':' ‖ id) as a uniform draw in [0, 1) (the same
    engine-portable construction as the t06 minhash oracle mode);
    the split draw re-salts so keep and split are independent.

    Plan shape: two codegen'd hash projections and ONE map-side-
    combinable aggregate keyed on the source — no data-sized shuffle,
    no window, bodies reduced to a token count before the exchange.
    Returns per source: n_total, n_kept, n_train, n_val, n_test,
    kept_tokens.
    """
    two60 = float(1 << 60)

    def draw(s: str) -> Column:
        h = F.md5(F.concat(F.lit(s + ":"), F.col(id_col).cast("string")))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") / F.lit(two60)

    rate = F.lit(1.0)
    for src, r in sorted(weights.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    u_keep = draw(salt)
    u_split = draw(salt + "/split")
    kept = F.when(u_keep < rate, F.lit(1)).otherwise(F.lit(0))
    split = (
        F.when(u_split < F.lit(float(val_frac)), F.lit("val"))
        .when(u_split < F.lit(float(val_frac + test_frac)), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    d = docs.select(
        F.col(source_col),
        kept.alias("_k"),
        split.alias("_s"),
        F.size(F.split(F.col(text_col), " ")).alias("_tok"),
    )
    return d.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("_k").cast("long").alias("n_kept"),
        F.sum(F.when((F.col("_k") == 1) & (F.col("_s") == "train"), 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when((F.col("_k") == 1) & (F.col("_s") == "val"), 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when((F.col("_k") == 1) & (F.col("_s") == "test"), 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
        F.sum(F.when(F.col("_k") == 1, F.col("_tok")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
    )
