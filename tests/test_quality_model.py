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
