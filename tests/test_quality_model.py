"""Trained quality classifier (operators/quality_model.py): training
determinism, held-out generalization, and Spark↔reference parity."""

from __future__ import annotations

from cowsdb_spark.localdf import local_df
from cowsdb_spark.operators.quality_model import (
    GOOD,
    HELDOUT_GOOD,
    HELDOUT_JUNK,
    JUNK,
    features,
    is_quality,
    score_doc,
    train,
)
from cowsdb_spark.operators.text import quality_score


class TestModel:
    def test_training_separates_seed_corpus(self):
        assert all(is_quality(t) for t in GOOD)
        assert not any(is_quality(t) for t in JUNK)

    def test_heldout_generalization(self):
        # samples NOT in the training lists: real prose keeps, spam
        # and navigation boilerplate drop
        assert all(is_quality(t) for t in HELDOUT_GOOD)
        assert not any(is_quality(t) for t in HELDOUT_JUNK)

    def test_deterministic_integers(self):
        b, w = train()
        assert isinstance(b, int) and all(isinstance(x, int) for x in w)
        # retrain in a fresh cache gives the same integers (no RNG)
        train.cache_clear()
        assert train() == (b, w)

    def test_score_is_pure_integer_dot_product(self):
        b, w = train()
        t = HELDOUT_GOOD[0]
        f = features(t)
        assert score_doc(t) == b + sum(wi * fi for wi, fi in zip(w, f))


class TestSparkParity:
    def test_operator_matches_reference_scorer(self, spark):
        # the codegen dot product in quality_score must equal the
        # pure-Python reference on every seed + held-out doc —
        # including the integer feature quantization (half-up rounding)
        texts = GOOD + JUNK + HELDOUT_GOOD + HELDOUT_JUNK
        df = local_df(
            spark,
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: (r.model_score_m, r.model_keep)
            for r in quality_score(df).collect()
        }
        for i, t in enumerate(texts):
            assert rows[i] == (score_doc(t), is_quality(t)), (i, t)

    def test_edge_cases(self, spark):
        df = local_df(
            spark,
            [(0, ""), (1, "   "), (2, "x"), (3, ". . . . .")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r.model_score_m for r in quality_score(df).collect()}
        texts = {0: "", 1: "   ", 2: "x", 3: ". . . . ."}
        for i, t in texts.items():
            assert rows[i] == score_doc(t), (i, t)


class TestGopherRules:
    """Each Gopher rule fires on a doc constructed to violate exactly
    it (operators/text.py::gopher_rules)."""

    def test_each_rule_and_pass(self, spark):
        from cowsdb_spark.operators.text import gopher_rules

        good = (
            "the story begins with a quiet morning and the town wakes "
            "slowly as people have their breakfast and walk to work "
            "past the old clock tower that has stood there for years "
            "and will stand for many more to come with its bells "
            "ringing out over the rooftops every hour of the day"
        )  # 56 words, all rules pass
        docs = [
            (0, good),
            (1, "the cat sat with me"),  # < 50 words -> r_wordcount
            (2, " ".join(["the", "be"] + ["a"] * 60)),  # mean word < 3
            (3, " ".join(["the", "be"] + ["12345"] * 60)),  # alpha < 80%
            (4, " ".join(["the", "be"] + ["word"] * 48) + " " + "# " * 20),  # symbols
            (5, "\n".join(["- item " + str(i) for i in range(20)])),  # bullets
            (6, "\n".join(["the line goes on..." for _ in range(10)])),  # ellipses
            (7, " ".join(["purple"] * 80)),  # no stopwords
        ]
        df = local_df(spark, docs, "doc_id long, text string")
        r = {x.doc_id: x for x in gopher_rules(df).collect()}
        assert r[0].gopher_pass, r[0]
        assert not r[1].r_wordcount and not r[1].gopher_pass
        assert not r[2].r_meanword
        assert not r[3].r_alpha
        assert not r[4].r_symbol
        assert not r[5].r_bullet  # 100% bullet lines > 90%
        assert not r[6].r_ellipsis  # 100% ellipsis lines > 30%
        assert not r[7].r_stopwords


class TestMixedFixtureSeparation:
    """The v2 scale-fixture generator (tools/gen_docs.py) plants a
    ~10% prose subpopulation (doc_id % 10 == 3) so the funnel's
    classifier/Gopher audit separates populations (VERDICT r8 #2).
    Small-scale replica of the BENCH_PIPELINE assertion."""

    def test_prose_subpopulation_separates(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from cowsdb_spark.operators.text import gopher_rules, quality_score
        from tools.gen_docs import generate

        path = generate(path=str(tmp_path / "docs.parquet"), n=5000)
        docs = spark.read.parquet(path)
        q = quality_score(docs).select("doc_id", "model_keep")
        g = gopher_rules(docs).select("doc_id", "gopher_pass")
        # overall keep fractions land near the planted prose fraction
        mk = q.filter("model_keep").count() / 5000
        gp = g.filter("gopher_pass").count() / 5000
        assert 0.05 <= mk <= 0.15, mk
        assert 0.05 <= gp <= 0.15, gp
        # population purity outside the dup-planted tail (last 10%):
        # prose rows keep, salad rows don't
        head = F.col("doc_id") < 4500
        prose = F.col("doc_id") % 10 == 3
        n_prose = q.filter(head & prose).count()
        n_salad = q.filter(head & ~prose).count()
        assert (
            q.filter(head & prose & F.col("model_keep")).count() / n_prose
            > 0.95
        )
        assert (
            q.filter(head & ~prose & F.col("model_keep")).count() / n_salad
            < 0.01
        )
        assert (
            g.filter(head & prose & F.col("gopher_pass")).count() / n_prose
            > 0.9
        )
        assert (
            g.filter(head & ~prose & F.col("gopher_pass")).count() / n_salad
            < 0.01
        )
