"""BPE tokenizer training: equality with a pure-Python reference
implementation, greedy-merge semantics, and plan shape."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cowsdb_spark.catalog import load_table
from cowsdb_spark.operators.bpe import tokenize_bpe, train_bpe, word_freq


def _py_train_bpe(texts, n_merges):
    freq = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}
    # dict merging: same word-shapes collapse after merges
    merged_vocab = Counter()
    for syms, f in vocab.items():
        merged_vocab[syms] += f
    vocab = merged_vocab
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        new_vocab = Counter()
        for syms, f in vocab.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new_vocab[tuple(out)] += f
        vocab = new_vocab
    return merges


def _py_tokenize(text, merges):
    toks = 0
    for w in text.lower().split(" "):
        if not w:
            continue
        syms = list(w)
        for l, r in merges:
            if len(syms) < 2:
                break
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms = out
        toks += len(syms)
    return toks


class TestTrainBpe:
    def test_matches_python_reference(self, spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        got = [tuple(r) for r in train_bpe(d, n_merges=8).collect()]
        texts = [r["text"] for r in d.select("text").collect()]
        want = _py_train_bpe(texts, 8)
        assert got == want

    def test_greedy_overlap_rule(self, spark):
        # "aaa b" under merge (a,a): greedy left-to-right gives
        # (aa, a), so the second merge is (aa, a), not (a, aa)
        from cowsdb_spark.localdf import local_df

        d = local_df(
            spark, [(0, "aaa aaa ab")], "doc_id long, text string"
        )
        rows = [tuple(r) for r in train_bpe(d, n_merges=2).collect()]
        assert rows[0][1:4] == ("a", "a", "aa")
        assert rows[1][1:4] == ("aa", "a", "aaa")

    def test_word_freq_one_shuffle(self, spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        plan = (
            word_freq(d)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 1

    def test_tokenize_matches_python(self, spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        merges_rows = train_bpe(d, n_merges=6).collect()
        merges = [(r["lft"], r["rgt"]) for r in merges_rows]
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in tokenize_bpe(d, merges).collect()
        }
        sample = d.select("doc_id", "text").limit(50).collect()
        for r in sample:
            words = [w for w in r["text"].lower().split(" ") if w]
            assert got[r["doc_id"]][0] == len(words)
            assert got[r["doc_id"]][1] == _py_tokenize(r["text"], merges)

    def test_tokenize_zero_shuffle(self, spark, sf_dir):
        d = load_table(spark, sf_dir, "documents")
        plan = (
            tokenize_bpe(d, [("e", "r"), ("o", "r")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan

    def test_escaping_in_fold(self, spark):
        # symbols containing a quote must not break the generated fold
        from cowsdb_spark.localdf import local_df

        d = local_df(spark, [(0, "a'b a'b a'b")], "doc_id long, text string")
        rows = [tuple(r) for r in train_bpe(d, n_merges=1).collect()]
        assert rows[0][1:4] == ("'", "b", "'b") or rows[0][1:4] == (
            "a",
            "'",
            "a'",
        )
