"""hashed_embedding: counts replica, norms, near-dup signal, and
composition with the dense lane (embedding_neardup_pairs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river"),
    (1, "the quick brown fox jumps over the lazy dog near the bank"),
    (2, "completely different words about cooking pasta with garlic"),
    (3, ""),
]


class TestHashedEmbedding:
    def test_counts_match_python_replica_md5(self, spark):
        import hashlib

        from cowsdb_spark.operators.embeddings import hashed_embedding

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r.doc_id: list(r.embedding)
            for r in hashed_embedding(
                d, dim=16, hash_fn="md5", normalize=False
            ).collect()
        }
        for doc_id, text in DOCS:
            want = [0] * 16
            for t in text.split(" "):
                if not t:
                    continue
                h = int(
                    hashlib.md5((t + "\x1fhemb").encode()).hexdigest()[:15], 16
                )
                want[h % 16] += 1
            if sum(want) == 0:
                assert doc_id not in got  # no tokens -> no row
            else:
                assert got[doc_id] == want, doc_id

    def test_normalized_and_neardup_signal(self, spark):
        from cowsdb_spark.operators.embeddings import hashed_embedding

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        emb = {
            r.doc_id: list(r.embedding)
            for r in hashed_embedding(d, dim=64).collect()
        }
        for v in emb.values():
            assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        # docs 0/1 differ by one token -> high cosine; 0/2 unrelated
        assert cos(emb[0], emb[1]) > 0.85
        assert cos(emb[0], emb[2]) < 0.35

    def test_composes_with_dense_neardup_lane(self, spark):
        from cowsdb_spark.operators.dedup import embedding_neardup_pairs
        from cowsdb_spark.operators.embeddings import hashed_embedding

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        emb = hashed_embedding(d, dim=64).withColumnRenamed(
            "doc_id", "vec_id"
        )
        pairs = {
            (r.id_a, r.id_b)
            for r in embedding_neardup_pairs(
                emb, threshold=0.8, n_blocks=2
            ).collect()
        }
        assert pairs == {(0, 1)}

    def test_validation(self, spark):
        import pytest

        from cowsdb_spark.operators.embeddings import hashed_embedding

        d = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError, match="dim"):
            hashed_embedding(d, dim=0)
