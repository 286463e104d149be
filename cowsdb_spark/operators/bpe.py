"""Byte-pair-encoding tokenizer training at corpus scale.

Public-knowledge basis: Sennrich et al. 2016 (arXiv:1508.07909) —
BPE learns a merge table by repeatedly fusing the most frequent
adjacent symbol pair. The classic scale trick (used by every
practical implementation) is to train on the DISTINCT-WORD frequency
table, not the raw corpus: pair statistics are identical because a
word's internal pairs occur once per word occurrence.

Spark-first / 100 TB design:

- The ONLY corpus-scale stage is the word-frequency aggregation (one
  shuffle on the word key, map-side combined). Everything after runs
  on the distinct-word table, which is bounded by vocabulary size,
  not corpus size — it is persisted once and each merge iteration is
  a small job over it.
- Each iteration = adjacent-pair explode → groupBy(pair) weighted
  count → a ONE-ROW collect of the argmax (bounded driver traffic,
  same budget class as quantile.py's scalar agg rows) → the merge is
  applied distributively as a greedy left-to-right ``aggregate``
  fold over each word's symbol array (JVM higher-order function, no
  Python).
- Determinism: ties on pair count break lexicographically on
  (left, right); the greedy fold is sequential, so "aaa" under merge
  (a,a) becomes (aa, a) — the same on every engine that folds left
  to right (the DuckDB oracle uses ``list_reduce`` with the same
  CASE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Separator for tokenize_bpe's flat representation (defined up here
# because word_freq strips it from the training stream too).
_SEP = "\x1f"

_SYMS0 = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"

_PAIRS = (
    "explode(transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS l, "
    "element_at(syms, CAST(i + 1 AS INT)) AS r)))"
)


def word_freq(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the one
    corpus-scale shuffle of BPE training.

    The ``_SEP`` unit-separator control char is stripped here exactly
    as ``tokenize_bpe`` strips it, so training and application see
    the same symbol stream (a corpus containing \\x1f would otherwise
    train merges over symbols the tokenizer never materializes —
    ADVICE r7)."""
    return (
        docs.select(
            F.explode(
                F.split(F.translate(F.lower(F.col(text_col)), _SEP, ""), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold_sql(left: str, right: str) -> str:
    """Greedy left-to-right pair merge as a SQL fold: accumulator
    starts as [syms[1]]; each next symbol either fuses with the
    accumulator's last element or appends. Mirrors the oracle's
    ``list_reduce`` exactly (first element as the seed)."""
    l = left.replace("\\", "\\\\").replace("'", "\\'")
    r = right.replace("\\", "\\\\").replace("'", "\\'")
    return (
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), "
        "array(element_at(syms, 1)), "
        f"(acc, x) -> CASE WHEN element_at(acc, -1) = '{l}' AND x = '{r}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}')) "
        "ELSE concat(acc, array(x)) END) END"
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first *n_merges* BPE merges; returns a DataFrame
    (mrank int, lft string, rgt string, merged string,
    pair_count bigint) ordered by mrank.

    Each iteration's vocab is ``localCheckpoint``-ed (the
    connected-components pattern for iterative plans): a merge fold
    references its input array several times, so chaining the
    projections lazily would inline the previous level once per
    reference — exponential expression growth that OOMs codegen by
    ~8 levels. Checkpointing materializes the bounded vocab table and
    keeps every iteration's plan one fold deep; blocks free on GC."""
    from ..localdf import local_df

    spark = docs.sparkSession
    vocab = (
        word_freq(docs, text_col)
        .select(F.expr(_SYMS0).alias("syms"), F.col("freq"))
        # eager=False (r9): the next pair-count collect materializes
        # the checkpoint as part of its own job — one job per
        # iteration instead of two. Lineage is truncated at plan
        # creation either way, so the anti-exponential-growth
        # guarantee is unchanged.
        .localCheckpoint(eager=False)
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            vocab.filter(F.size("syms") >= 2)
            .select(F.expr(_PAIRS).alias("pr"), "freq")
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rank, l, r, l + r, c))
        if rank < n_merges:
            vocab = vocab.select(
                F.expr(_merge_fold_sql(l, r)).alias("syms"), "freq"
            ).localCheckpoint(eager=False)
    return local_df(
        spark,
        merges,
        "mrank int, lft string, rgt string, merged string, "
        "pair_count long",
    )


# Separator for the flat tokenization representation: every symbol
# is wrapped as SEP+sym+SEP, so a document reads /h//i/ /y//o/ and a
# merge (l, r) is the literal string replace /l//r/ -> /lr/. Java's
# replace scans left-to-right non-overlapping, which IS the greedy
# fold: '/a//a//a/' under (a,a) -> '/aa//a/'. The unit-separator
# control char can't appear in tokens (it is stripped from the text
# first), so a pattern can never match inside a longer symbol, and
# merges can never cross the plain-space word boundary. (_SEP itself
# is defined at the top of the module — word_freq strips it too.)


def tokenize_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list (rank order) to the corpus:
    (id, n_words, n_tokens) — the token-count surface a data
    pipeline budgets with.

    Merges are compile-time constants applied on a FLAT string
    representation (see ``_SEP``): one linear ``replace`` scan of
    each document per merge — zero shuffle, no per-element array
    allocation (the earlier fold-per-word formulation did O(len²)
    array copies per merge and ran 20× slower at 1M docs). The final
    token count is half the separator count."""
    # wrap every non-space char ([^ ] — the word delimiter is the
    # plain space, matching word_freq's split; other whitespace stays
    # a symbol exactly like the fold formulation treated it)
    s = F.regexp_replace(
        F.translate(F.lower(F.col(text_col)), _SEP, ""),
        "([^ ])",
        _SEP + "$1" + _SEP,
    )
    df = docs.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
        ).alias("n_words"),
        s.alias("_s"),
    )
    # one projection per merge (CollapseProject keeps them separate —
    # see train_bpe's note on exponential inlining; replace() uses its
    # input once, but stacked projections also keep codegen methods
    # small and JIT-friendly)
    for l, r in merges:
        df = df.withColumn(
            "_s",
            F.replace(
                F.col("_s"),
                F.lit(f"{_SEP}{l}{_SEP}{_SEP}{r}{_SEP}"),
                F.lit(f"{_SEP}{l}{r}{_SEP}"),
            ),
        )
    n_sep = F.length("_s") - F.length(F.translate(F.col("_s"), _SEP, ""))
    return df.select(
        id_col,
        "n_words",
        (n_sep / F.lit(2)).cast("long").alias("n_tokens"),
    )
