"""Product quantization: code shape, ADC recall vs exact L2,
determinism, and plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cowsdb_spark.catalog import load_table
from cowsdb_spark.operators.pq import pq_encode, pq_topk, pq_train


def _fixture(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return emb, ids, vecs


class TestPq:
    def test_codes_shape_and_range(self, spark, sf_dir):
        emb, ids, vecs = _fixture(spark, sf_dir)
        book = pq_train(emb, m=8)
        codes = pq_encode(emb, book).collect()
        assert len(codes) == len(ids)
        for r in codes:
            assert len(r["code"]) == 8
            assert all(-128 <= c <= 127 for c in r["code"])

    def test_compression_is_32x(self, spark, sf_dir):
        # 64 float32 -> 8 tinyint codes
        emb, _, vecs = _fixture(spark, sf_dir)
        assert vecs.shape[1] * 4 / 8 == 32.0

    def test_adc_values_match_numpy_reconstruction(self, spark, sf_dir):
        # exact mechanism check: the operator's ADC distance for every
        # returned id must equal the numpy distance between the query
        # and that id's RECONSTRUCTED (quantized) vector
        emb, ids, vecs = _fixture(spark, sf_dir)
        book = pq_train(emb, m=8)
        books = [np.asarray(b) for b in book]
        codes_rows = pq_encode(emb, book).collect()
        recon = {}
        for r in codes_rows:
            c = np.array(r["code"], dtype=np.int16) + 128
            recon[r["vec_id"]] = np.concatenate(
                [books[j][c[j]] for j in range(8)]
            )
        q = vecs[ids == 0][0]
        got = pq_topk(pq_encode(emb, book), book, q, k=10).collect()
        for r in got:
            want = round(float(((recon[r["vec_id"]] - q) ** 2).sum()), 6)
            assert abs(r["adc"] - want) < 1e-6, (r["vec_id"], r["adc"], want)
        # and the returned set is the true ADC top-k over all ids
        all_adc = sorted(
            (round(float(((v - q) ** 2).sum()), 6), i)
            for i, v in recon.items()
        )[:10]
        assert [i for _, i in all_adc] == [r["vec_id"] for r in got]

    def test_adc_recall_vs_exact_l2(self, spark, sf_dir):
        emb, ids, vecs = _fixture(spark, sf_dir)
        book = pq_train(emb, m=8)
        codes = pq_encode(emb, book)
        hits = total = 0
        for qid in (0, 7, 13):
            q = vecs[ids == qid][0]
            exact = set(
                ids[np.argsort(((vecs - q) ** 2).sum(axis=1))[:10]].tolist()
            )
            got = {
                r["vec_id"] for r in pq_topk(codes, book, q, k=10).collect()
            }
            hits += len(exact & got)
            total += 10
        # the synthetic fixture is adversarially uniform (every
        # direction random — the regime t19's docstring documents as
        # the hardest case for any quantizer); recall here is a
        # sanity floor, the clustered-corpus number lives in
        # BENCH_ANN_1M.json where PQ sees real geometry
        assert hits / total >= 0.5, hits / total

    def test_deterministic(self, spark, sf_dir):
        emb, ids, vecs = _fixture(spark, sf_dir)
        book = pq_train(emb, m=8)
        codes = pq_encode(emb, book)
        q = vecs[0]
        a = [tuple(r) for r in pq_topk(codes, book, q, k=5).collect()]
        b = [tuple(r) for r in pq_topk(codes, book, q, k=5).collect()]
        assert a == b

    def test_no_wide_exchange(self, spark, sf_dir):
        # scoring scans codes and exchanges only per-partition top-k
        emb, _, vecs = _fixture(spark, sf_dir)
        book = pq_train(emb, m=4)
        codes = pq_encode(emb, book)
        plan = (
            pq_topk(codes, book, vecs[0], k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan or "Exchange" not in plan

    def test_validation(self, spark, sf_dir):
        emb, _, vecs = _fixture(spark, sf_dir)
        import pytest

        with pytest.raises(ValueError):
            pq_train(emb, m=7)  # 64 % 7 != 0
        book = pq_train(emb, m=8)
        with pytest.raises(ValueError):
            pq_topk(pq_encode(emb, book), book, vecs[0][:32], k=5)


class TestPqRerank:
    def test_rerank_returns_exact_top_among_candidates(self, spark, sf_dir):
        from cowsdb_spark.operators.pq import pq_topk_rerank

        emb, ids, vecs = _fixture(spark, sf_dir)
        book = pq_train(emb, m=8)
        codes = pq_encode(emb, book)
        q = vecs[ids == 0][0]
        got = pq_topk_rerank(codes, emb, book, q, k=10, refine=10).collect()
        assert len(got) == 10
        # reranked distances are EXACT: recompute in numpy
        for r in got:
            want = round(float(((vecs[ids == r["vec_id"]][0] - q) ** 2).sum()), 6)
            assert abs(r["d2"] - want) < 1e-6
        # with refine=n/k (all candidates) the result IS the exact top-k
        full = pq_topk_rerank(codes, emb, book, q, k=10, refine=50).collect()
        exact = ids[np.argsort(((vecs - q) ** 2).sum(axis=1))[:10]].tolist()
        assert [r["vec_id"] for r in full] == exact


class TestIvfPq:
    """IVF × PQ composed index (IVFADC): residual mechanism exactness,
    recall vs the flat-PQ baseline, cell pruning, determinism."""

    def test_adc_values_match_residual_reconstruction(self, spark, sf_dir):
        # mechanism check, same style as TestPq: every returned adc
        # must equal the numpy distance between the query and the
        # RECONSTRUCTED vector centroid(cell) + codebook[code]
        from cowsdb_spark.operators.pq import ivf_pq_build, ivf_pq_topk

        emb, ids, vecs = _fixture(spark, sf_dir)
        codes, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        books = [np.asarray(b) for b in book]
        cents_np = np.asarray(cents)
        rows = codes.collect()
        recon = {}
        cell_of = {}
        for r in rows:
            c = np.array(r["code"], dtype=np.int16) + 128
            recon[r["vec_id"]] = cents_np[r["_cell"]] + np.concatenate(
                [books[j][c[j]] for j in range(8)]
            )
            cell_of[r["vec_id"]] = r["_cell"]
        q = vecs[ids == 0][0]
        got = ivf_pq_topk(codes, cents, book, q, k=10, nprobe=8).collect()
        for r in got:
            want = round(float(((recon[r["vec_id"]] - q) ** 2).sum()), 6)
            assert abs(r["adc"] - want) < 1e-6, (r["vec_id"], r["adc"], want)
        # nprobe = all cells -> the returned set is the true ADC top-k
        all_adc = sorted(
            (round(float(((v - q) ** 2).sum()), 6), i) for i, v in recon.items()
        )[:10]
        assert [i for _, i in all_adc] == [r["vec_id"] for r in got]

    def test_build_deterministic_across_partitionings(self, spark, sf_dir):
        # ADVICE r8: the residual-codebook sample was an unordered
        # .limit().collect(), so the codebook could vary with input
        # partitioning. Now orderBy(id).limit — same codes regardless
        # of how the input arrives.
        from cowsdb_spark.operators.pq import ivf_pq_build

        emb, _, _ = _fixture(spark, sf_dir)
        c1, cents1, book1 = ivf_pq_build(emb, n_centroids=8, m=8)
        c2, cents2, book2 = ivf_pq_build(
            emb.repartition(7), n_centroids=8, m=8
        )
        assert np.allclose(np.asarray(cents1), np.asarray(cents2))
        for b1, b2 in zip(book1, book2):
            assert np.allclose(np.asarray(b1), np.asarray(b2))
        rows1 = {r["vec_id"]: (r["_cell"], tuple(r["code"])) for r in c1.collect()}
        rows2 = {r["vec_id"]: (r["_cell"], tuple(r["code"])) for r in c2.collect()}
        assert rows1 == rows2

    def test_prune_scans_only_probed_cells(self, spark, sf_dir):
        from cowsdb_spark.operators.pq import ivf_pq_build, ivf_pq_topk

        emb, ids, vecs = _fixture(spark, sf_dir)
        codes, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        q = vecs[ids == 3][0]
        # nprobe=2: every returned id must live in one of the 2
        # nearest cells (the _cell filter is the partition prune)
        cents_np = np.asarray(cents)
        probe = set(
            np.argsort(((cents_np - q) ** 2).sum(axis=1))[:2].tolist()
        )
        cell_of = {r["vec_id"]: r["_cell"] for r in codes.collect()}
        got = ivf_pq_topk(codes, cents, book, q, k=10, nprobe=2).collect()
        assert got and all(cell_of[r["vec_id"]] in probe for r in got)

    def test_residual_beats_or_matches_flat_pq_recall(self, spark, sf_dir):
        # residual quantization at equal bytes should not LOSE to flat
        # PQ on average; assert the composed index still clears the
        # flat baseline's sanity floor on this adversarially-uniform
        # fixture (clustered-geometry numbers live in BENCH_ANN_1M)
        from cowsdb_spark.operators.pq import ivf_pq_build, ivf_pq_topk

        emb, ids, vecs = _fixture(spark, sf_dir)
        codes, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        hits = total = 0
        for qid in (0, 7, 13):
            q = vecs[ids == qid][0]
            exact = set(
                ids[np.argsort(((vecs - q) ** 2).sum(axis=1))[:10]].tolist()
            )
            got = {
                r["vec_id"]
                for r in ivf_pq_topk(
                    codes, cents, book, q, k=10, nprobe=8
                ).collect()
            }
            hits += len(exact & got)
            total += 10
        assert hits / total >= 0.5, hits / total

    def test_rerank_exact_distances_and_determinism(self, spark, sf_dir):
        from cowsdb_spark.operators.pq import (
            ivf_pq_build,
            ivf_pq_topk,
            ivf_pq_topk_rerank,
        )

        emb, ids, vecs = _fixture(spark, sf_dir)
        codes, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        q = vecs[ids == 0][0]
        got = ivf_pq_topk_rerank(
            codes, emb, cents, book, q, k=10, nprobe=8, refine=10
        ).collect()
        assert len(got) == 10
        for r in got:
            want = round(
                float(((vecs[ids == r["vec_id"]][0] - q) ** 2).sum()), 6
            )
            assert abs(r["d2"] - want) < 1e-6
        a = [tuple(r) for r in ivf_pq_topk(codes, cents, book, q, k=5).collect()]
        b = [tuple(r) for r in ivf_pq_topk(codes, cents, book, q, k=5).collect()]
        assert a == b

    def test_partition_prune_on_cell_layout(self, spark, sf_dir, tmp_path):
        # the 100 TB layout claim as a plan assertion: codes written
        # partitionBy(_cell) and probed with nprobe=2 must carry a
        # _cell partition filter (file pruning), not a full scan
        from cowsdb_spark.operators.pq import ivf_pq_build, ivf_pq_topk

        emb, ids, vecs = _fixture(spark, sf_dir)
        codes, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        p = str(tmp_path / "ivfpq_codes")
        codes.write.partitionBy("_cell").parquet(p)
        inv = spark.read.parquet(p)
        plan = (
            ivf_pq_topk(inv, cents, book, vecs[0], k=5, nprobe=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        tail = plan.split("PartitionFilters")[-1][:200]
        assert "PartitionFilters" in plan and "_cell" in tail, plan[:2000]


class TestIvfPqIncrement:
    """Incremental ingest against a FROZEN IVF x PQ index (r9): the
    daily-append story for the ANN lane, mirroring the incremental
    LSH store tests for the dedup lane."""

    def test_increment_matches_build_encoding(self, spark, sf_dir):
        # vectors the build already saw must encode to the SAME
        # (cell, code) rows under the frozen parameters
        from cowsdb_spark.operators.pq import (
            ivf_pq_build,
            ivf_pq_encode_increment,
        )

        emb, _, _ = _fixture(spark, sf_dir)
        codes, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        inc = ivf_pq_encode_increment(emb.repartition(5), cents, book)
        built = {r["vec_id"]: (r["_cell"], tuple(r["code"])) for r in codes.collect()}
        incr = {r["vec_id"]: (r["_cell"], tuple(r["code"])) for r in inc.collect()}
        assert built == incr

    def test_appended_store_serves_queries(self, spark, sf_dir, tmp_path):
        # build on the first 80%, increment-encode the rest, append to
        # the partitionBy(_cell) parquet store; a query vector FROM the
        # increment must come back as its own exact top-1 via rerank
        import numpy as np

        from cowsdb_spark.operators.pq import (
            ivf_pq_build,
            ivf_pq_encode_increment,
            ivf_pq_topk_rerank,
        )

        emb, ids, vecs = _fixture(spark, sf_dir)
        cut = int(np.quantile(ids, 0.8))
        base = emb.filter(F.col("vec_id") <= cut)
        new = emb.filter(F.col("vec_id") > cut)
        codes, cents, book = ivf_pq_build(base, n_centroids=8, m=8)
        store = str(tmp_path / "ivfpq_store")
        codes.write.partitionBy("_cell").parquet(store)
        ivf_pq_encode_increment(new, cents, book).write.mode(
            "append"
        ).partitionBy("_cell").parquet(store)
        grown = spark.read.parquet(store)
        assert grown.count() == len(ids)
        qid = int(ids.max())
        q = vecs[ids == qid][0]
        top = ivf_pq_topk_rerank(
            grown, emb, cents, book, q, k=3, nprobe=8
        ).collect()
        assert top[0]["vec_id"] == qid and top[0]["d2"] == 0.0

    def test_increment_plan_is_map_side_only(self, spark, sf_dir):
        from cowsdb_spark.operators.pq import (
            ivf_pq_build,
            ivf_pq_encode_increment,
        )

        emb, _, _ = _fixture(spark, sf_dir)
        _, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        plan = (
            ivf_pq_encode_increment(emb, cents, book)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan[:2000]

    def test_dim_mismatch_raises(self, spark, sf_dir):
        import pytest

        from cowsdb_spark.operators.pq import (
            ivf_pq_build,
            ivf_pq_encode_increment,
        )

        emb, _, _ = _fixture(spark, sf_dir)
        _, cents, book = ivf_pq_build(emb, n_centroids=8, m=8)
        bad_cents = [c[:-4] for c in cents]
        with pytest.raises(ValueError, match="dim"):
            ivf_pq_encode_increment(emb, bad_cents, book)


class TestTrainSampleSpread:
    def test_training_sample_not_biased_to_smallest_ids(self, spark):
        # two tight clusters, ids 0..499 around +u, ids 500..999
        # around -u; train_sample=250 < |first cluster|. A
        # smallest-n-ids sample would never see the second cluster
        # and leave it with no nearby centroid; the hash-ordered
        # spread sample must place centroids near BOTH.
        import numpy as np

        from cowsdb_spark.localdf import local_df
        from cowsdb_spark.operators.similarity import ivf_build

        rng = np.random.default_rng(3)
        u = np.ones(8) / np.sqrt(8.0)
        a = u + rng.normal(scale=0.05, size=(500, 8))
        b = -u + rng.normal(scale=0.05, size=(500, 8))
        rows = [
            (i, [float(x) for x in v])
            for i, v in enumerate(np.vstack([a, b]))
        ]
        df = local_df(
            spark, rows, "vec_id long, embedding array<double>"
        )
        _, cents = ivf_build(df, n_centroids=4, train_sample=250)
        cents = np.asarray(cents)
        d_to_b = np.linalg.norm(cents - (-u), axis=1).min()
        assert d_to_b < 0.5, d_to_b  # some centroid sits in cluster B
