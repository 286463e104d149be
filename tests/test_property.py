"""Property-based checks for the custom operators.

Randomized inputs cross-checked against independent implementations
(numpy percentile, pandas merge_asof) — the operators' semantics must
hold on inputs nobody hand-picked. Example counts are small because
each example is a Spark job; deadline disabled for JVM warm-up.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cowsdb_spark.operators.asof import asof_join
from cowsdb_spark.operators.quantile import exact_percentiles

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


class TestExactPercentileProperty:
    @given(
        vals=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=200,
        ),
        q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]),
    )
    @settings(**_SETTINGS)
    def test_matches_numpy_linear_interpolation(self, spark, vals, q):
        df = spark.createDataFrame(pd.DataFrame({"v": vals}))
        (got,) = exact_percentiles(df, "v", [q])
        want = float(np.percentile(np.array(vals, dtype=float), q * 100))
        assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


class TestAsofProperty:
    @given(
        lts=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
        rts=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
        direction=st.sampled_from(["backward", "forward", "nearest"]),
    )
    @settings(**_SETTINGS)
    def test_matches_pandas_merge_asof(self, spark, lts, rts, direction):
        rts = sorted(set(rts))  # asof right side: distinct sorted ts
        left = pd.DataFrame({"k": 1, "ts": sorted(lts)})
        right = pd.DataFrame({"k": 1, "ts": rts, "v": [float(t) for t in rts]})
        want = pd.merge_asof(
            left, right, on="ts", by="k", direction=direction
        )["v"].tolist()

        ldf = spark.createDataFrame(left[["k", "ts"]])
        rdf = spark.createDataFrame(right)
        got = (
            asof_join(ldf, rdf, on="k", direction=direction)
            .orderBy("ts")
            .select("v")
            .toPandas()["v"]
            .tolist()
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if pd.isna(w):
                assert g is None or pd.isna(g)
            else:
                assert g == w


class TestIncrementalLshProperty:
    """The incremental contract on random corpora: LSH of an increment
    against the seen store == full-corpus pairs minus seen×seen, for
    ANY id split — nobody hand-picks the duplicate structure."""

    @given(
        texts=st.lists(
            st.sampled_from(
                [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon eta",
                    "one two three four five six seven",
                    "one two three four five six eight",
                    "totally different words here now ok",
                ]
            ),
            min_size=4,
            max_size=12,
        ),
        modulus=st.sampled_from([2, 3]),
    )
    @settings(derandomize=True, **_SETTINGS)
    def test_incremental_equals_full_minus_seen(self, spark, texts, modulus):
        from cowsdb_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_lsh_pairs_incremental,
            minhash_signature_table,
        )

        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        seen = docs.filter(F.col("doc_id") % modulus == 0)
        new = docs.filter(F.col("doc_id") % modulus != 0)
        full = {
            (r.id_a, r.id_b): r.jaccard_est
            for r in minhash_lsh_pairs(
                docs, min_jaccard=0.3, shingle_k=3
            ).collect()
        }
        want = {
            p: j
            for p, j in full.items()
            if not (p[0] % modulus == 0 and p[1] % modulus == 0)
        }
        store = minhash_signature_table(seen, shingle_k=3)
        got = {
            (r.id_a, r.id_b): r.jaccard_est
            for r in minhash_lsh_pairs_incremental(
                new, store, min_jaccard=0.3, shingle_k=3
            ).collect()
        }
        assert got == want


class TestQualityModelProperty:
    """Spark's codegen dot product == the pure-Python reference on
    arbitrary text (incl. unicode, control chars, odd whitespace)."""

    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_characters="\x00"
                ),
                max_size=80,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(derandomize=True, **_SETTINGS)
    def test_spark_matches_reference(self, spark, texts):
        from cowsdb_spark.localdf import local_df
        from cowsdb_spark.operators.quality_model import score_doc
        from cowsdb_spark.operators.text import quality_score

        rows = [(i, t) for i, t in enumerate(texts)]
        df = local_df(spark, rows, "doc_id long, text string")
        got = {
            r.doc_id: r.model_score_m for r in quality_score(df).collect()
        }
        for i, t in rows:
            assert got[i] == score_doc(t), repr(t)


class TestScrubDupSpansProperty:
    """Spark's closed-form block-merge scrub == the brute-force
    position-set reference on arbitrary small-vocab corpora (dense
    cross-doc collisions exercise adjacent/overlapping/island block
    geometry)."""

    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
            ),
            min_size=1,
            max_size=8,
        ),
        n=st.sampled_from([2, 3]),
    )
    @settings(derandomize=True, **_SETTINGS)
    def test_spark_matches_reference(self, spark, docs, n):
        from cowsdb_spark.localdf import local_df
        from cowsdb_spark.operators.text import scrub_dup_spans

        rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
        from tests.test_operators import _ref_scrub

        df = local_df(spark, rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed_tokens, r.scrubbed)
            for r in scrub_dup_spans(df, n=n, min_docs=2).collect()
        }
        assert got == _ref_scrub(rows, n, 2)


class TestBm25Property:
    """Spark's integer-micros BM25 == the pure-Python reference
    (same quantization) on arbitrary small-vocab corpora/queries."""

    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=1,
                max_size=10,
            ),
            min_size=1,
            max_size=6,
        ),
        qterms=st.lists(
            st.sampled_from(["a", "b", "c", "z"]), min_size=1, max_size=3
        ),
    )
    @settings(derandomize=True, **_SETTINGS)
    def test_spark_matches_reference(self, spark, docs, qterms):
        from cowsdb_spark.localdf import local_df
        from cowsdb_spark.operators.retrieval import bm25_topk
        from tests.test_retrieval import _ref_bm25

        rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
        queries = [(0, " ".join(qterms))]
        d = local_df(spark, rows, "doc_id long, text string")
        q = local_df(spark, queries, "query_id long, qtext string")
        got = [
            (r.query_id, r.doc_id, r.score_m, r.rank)
            for r in bm25_topk(d, q, k=4).orderBy("rank").collect()
        ]
        assert got == _ref_bm25(rows, queries, 4)
