"""bm25_topk: value tests vs a brute-force Python reference, lane
determinism across partitionings, and the broadcast-prune plan shape.
The full DuckDB oracle comparison rides t53_bm25_topk through
tests/test_conformance.py / tools/verify_driver_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox runs fast"),
    (2, "lazy dog sleeps all day long in the sun"),
    (3, "quick quick quick brown dog"),
    (4, "unrelated words entirely different content here"),
    (5, "fox fox fox fox fox"),
]
QUERIES = [(100, "quick brown fox"), (200, "lazy dog"), (300, "zebra")]


def _ref_bm25(docs, queries, k, k1=1.2, b=0.75):
    """Brute force with the operator's exact integer-micros lane."""
    toks = {i: t.split(" ") for i, t in docs}
    n = len(toks)
    tot = sum(len(t) for t in toks.values())
    out = []
    for qid, qt in queries:
        terms = set(w for w in qt.split(" ") if w)
        sc = {}
        for i, tl in toks.items():
            s, hit = 0, False
            for t in terms:
                tf = tl.count(t)
                if tf == 0:
                    continue
                hit = True
                df = sum(1 for tl2 in toks.values() if t in tl2)
                idf_m = math.floor(
                    math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5
                )
                tfn = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * ((len(tl) * n) / tot))
                )
                s += math.floor(idf_m * tfn + 0.5)
            if hit:
                sc[i] = s
        for r, (i, s) in enumerate(
            sorted(sc.items(), key=lambda x: (-x[1], x[0]))[:k], 1
        ):
            out.append((qid, i, s, r))
    return out


class TestBm25TopK:
    def test_matches_bruteforce(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
        got = [
            (r.query_id, r.doc_id, r.score_m, r.rank)
            for r in bm25_topk(d, q, k=3).orderBy("query_id", "rank").collect()
        ]
        assert got == _ref_bm25(DOCS, QUERIES, 3)

    def test_tie_breaks_on_doc_id(self, spark):
        # docs 0 and 2 score identically for "lazy dog" (same tf=1 each
        # term, same dl=9): rank order must be doc_id ascending
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(
            [(200, "lazy dog")], "query_id long, qtext string"
        )
        rows = bm25_topk(d, q, k=3).orderBy("rank").collect()
        assert rows[0].score_m == rows[1].score_m
        assert (rows[0].doc_id, rows[1].doc_id) == (0, 2)

    def test_no_hit_query_returns_nothing(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(
            [(300, "zebra xylophone")], "query_id long, qtext string"
        )
        assert bm25_topk(d, q, k=3).collect() == []

    def test_deterministic_across_partitionings(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
        base = sorted(map(tuple, bm25_topk(d, q, k=3).collect()))
        for nparts in (1, 7):
            rep = sorted(
                map(tuple, bm25_topk(d.repartition(nparts), q, k=3).collect())
            )
            assert rep == base

    def test_repeated_query_terms_count_once(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q1 = spark.createDataFrame(
            [(1, "fox")], "query_id long, qtext string"
        )
        q2 = spark.createDataFrame(
            [(1, "fox fox fox")], "query_id long, qtext string"
        )
        a = [(r.doc_id, r.score_m) for r in bm25_topk(d, q1, k=6).collect()]
        bq = [(r.doc_id, r.score_m) for r in bm25_topk(d, q2, k=6).collect()]
        assert sorted(a) == sorted(bq)

    def test_decontaminate_flags_leaked_doc(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_decontaminate

        train = spark.createDataFrame(DOCS, "doc_id long, text string")
        ev = spark.createDataFrame(
            [
                (900, "the quick brown fox jumps over the lazy dog"),
                (901, "completely disjoint vocabulary sentence"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r for r in bm25_decontaminate(train, ev, k=2).collect()
        }
        # doc 0 IS eval 900 verbatim: it must be flagged, best=900, rank-1
        assert 0 in out and out[0].best_eval_id == 900
        # doc 4 shares no vocabulary with either eval item: never flagged
        assert 4 not in out
        # everything flagged traces to the overlapping eval item only
        assert all(r.best_eval_id == 900 for r in out.values())

    def test_decontaminate_string_eval_ids(self, spark):
        # eval ids are often names/hashes: attribution must work on
        # non-numeric ids (rank window, not a negate-the-id max)
        from cowsdb_spark.operators.retrieval import bm25_decontaminate

        train = spark.createDataFrame(
            [(0, "alpha beta gamma")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [("mmlu", "alpha beta gamma"), ("gsm8k", "alpha beta gamma")],
            "doc_id string, text string",
        )
        row = bm25_decontaminate(train, ev, k=1).collect()[0]
        assert row.n_eval_hits == 2 and row.best_eval_id == "gsm8k"

    def test_decontaminate_best_ties_to_smallest_eval_id(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_decontaminate

        train = spark.createDataFrame(
            [(0, "alpha beta gamma")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(10, "alpha beta gamma"), (11, "alpha beta gamma")],
            "doc_id long, text string",
        )
        row = bm25_decontaminate(train, ev, k=1).collect()[0]
        assert row.n_eval_hits == 2 and row.best_eval_id == 10

    def test_query_terms_broadcast_prune(self, spark):
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
        plan = (
            bm25_topk(d, q, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_corpus_scanned_once(self, spark):
        # r8 verdict: the corpus was tokenized twice (stats aggregate
        # + postings). Now the pruned postings are checkpointed in ONE
        # job and the corpus scalars ride that scan as an Observation.
        # A test-side Observation on the doc frame counts rows flowing
        # through: exactly N under single-scan, 2N under the old shape.
        from pyspark.sql import Observation

        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        obs = Observation()
        d = d.observe(obs, F.count(F.lit(1)).alias("n_seen"))
        q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
        out = bm25_topk(d, q, k=3)
        assert obs.get["n_seen"] == len(DOCS)
        # and the checkpoint really feeds the result (values intact)
        assert out.count() > 0

    def test_empty_term_set_returns_empty(self, spark):
        # AQE empty-relation propagation prunes the metrics node when
        # no query term survives; the operator must fall back cleanly
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(
            [(1, "")], "query_id long, qtext string"
        )
        assert bm25_topk(d, q, k=3).count() == 0

    def test_topk_is_two_stage_group_limit(self, spark):
        # the rank filter must become Partial+Final WindowGroupLimit:
        # map tasks keep local top-k per query BEFORE the exchange, so
        # the per-query sort is O(k x partitions), not all candidates
        from cowsdb_spark.operators.retrieval import bm25_topk

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
        plan = (
            bm25_topk(d, q, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan and "Partial" in plan
