"""SemDeDup operator: value-level checks against a numpy reference,
plan-shape assertions, and the pii_audit one-pass merge contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cowsdb_spark.catalog import load_table
from cowsdb_spark.operators.semdedup import (
    assign_seed_clusters,
    seed_vectors,
    semdedup,
)


def _numpy_semdedup(ids, vecs, k, tau):
    """Sequential-double reference: argmax-cosine to the k lowest-id
    seeds (ties -> lower index), then drop ids with a same-cluster
    earlier neighbor at cosine >= tau."""
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    vecs = np.asarray(vecs, dtype=np.float64)[order]
    seeds = vecs[:k]
    norms = np.linalg.norm(vecs, axis=1)
    snorms = np.linalg.norm(seeds, axis=1)
    cos = (vecs @ seeds.T) / (norms[:, None] * snorms[None, :])
    cluster = np.argmax(cos, axis=1)  # argmax keeps first max = lower idx
    dropped = set()
    for c in np.unique(cluster):
        m = np.where(cluster == c)[0]
        sub = vecs[m]
        sims = (sub @ sub.T) / (norms[m][:, None] * norms[m][None, :])
        for j in range(1, len(m)):
            if np.any(sims[:j, j] >= tau):
                dropped.add(int(ids[m[j]]))
    return {int(i): (int(c), 0 if int(i) in dropped else 1)
            for i, c in zip(ids, cluster)}


class TestSemDedup:
    def test_matches_numpy_reference(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        got = {
            int(r["vec_id"]): (int(r["cluster"]), int(r["is_kept"]))
            for r in semdedup(emb, k=8, tau=0.45).collect()
        }
        raw = emb.select("vec_id", "embedding").collect()
        ids = [int(r["vec_id"]) for r in raw]
        vecs = [list(r["embedding"]) for r in raw]
        want = _numpy_semdedup(ids, vecs, k=8, tau=0.45)
        assert got == want
        assert any(v[1] == 0 for v in got.values()), (
            "fixture should contain at least one same-cluster near-dup"
        )

    def test_every_input_id_present_once(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        out = semdedup(emb, k=8, tau=0.45)
        n = emb.count()
        assert out.count() == n
        assert out.select("vec_id").distinct().count() == n

    def test_dropped_have_earlier_same_cluster_neighbor(self, spark, sf_dir):
        # structural invariant, independent of the numpy path: every
        # dropped id must have >=1 same-cluster neighbor with a
        # smaller id at cosine >= tau; id 0 can never be dropped.
        emb = load_table(spark, sf_dir, "embeddings")
        out = semdedup(emb, k=8, tau=0.45)
        kept0 = out.filter(F.col("vec_id") == 0).collect()
        assert kept0 and kept0[0]["is_kept"] == 1
        per_cluster_min = (
            out.groupBy("cluster").agg(F.min("vec_id").alias("lo")).collect()
        )
        lows = {r["lo"] for r in per_cluster_min}
        flagged = {
            r["vec_id"] for r in out.filter(F.col("is_kept") == 0).collect()
        }
        assert not (flagged & lows), (
            "the lowest id of a cluster has no earlier neighbor"
        )

    def test_seed_validation(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        with pytest.raises(ValueError):
            seed_vectors(emb.limit(3), k=8)

    def test_assignment_is_mapside_only(self, spark, sf_dir):
        # assignment must compile to scan -> project: no exchange, no
        # join, no Python eval anywhere in the plan
        emb = load_table(spark, sf_dir, "embeddings")
        plan = (
            assign_seed_clusters(emb, k=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for op in ("Exchange", "Join", "ArrowEval", "BatchEval"):
            assert op not in plan, f"unexpected {op} in assignment plan"

    def test_gemm_tier_matches_fold_tier(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        fold = {
            r["vec_id"]: (r["cluster"], r["is_kept"])
            for r in semdedup(emb, k=8, tau=0.45, mode="fold").collect()
        }
        gemm = {
            r["vec_id"]: (r["cluster"], r["is_kept"])
            for r in semdedup(emb, k=8, tau=0.45, mode="gemm").collect()
        }
        assert fold == gemm

    def test_auto_mode_picks_fold_for_small_k(self, spark, sf_dir):
        # the oracle/driver regime must keep the bit-matched tier
        emb = load_table(spark, sf_dir, "embeddings")
        plan = (
            semdedup(emb, k=8, tau=0.45, mode="auto")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "FlatMapGroupsInPandas" not in plan
        assert "MapInPandas" not in plan

    def test_kmeans_clustering_mode(self, spark, sf_dir):
        # the published construction: Lloyd centroids via ivf_build;
        # same output contract, same dedup rule, real geometry
        emb = load_table(spark, sf_dir, "embeddings")
        out = semdedup(emb, k=8, tau=0.45, clustering="kmeans")
        rows = out.collect()
        n = emb.count()
        assert len(rows) == n
        assert {r["is_kept"] for r in rows} <= {0, 1}
        assert len({r["cluster"] for r in rows}) <= 8
        # keep-first invariant holds regardless of clustering
        lows = {
            r["lo"]
            for r in out.groupBy("cluster")
            .agg(F.min("vec_id").alias("lo"))
            .collect()
        }
        flagged = {
            r["vec_id"] for r in out.filter(F.col("is_kept") == 0).collect()
        }
        assert not (flagged & lows)

    def test_no_cartesian_in_full_plan(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        plan = (
            semdedup(emb, k=8, tau=0.45)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestPiiAudit:
    def test_audit_equals_scan_plus_scrub(self, spark, sf_dir):
        from cowsdb_spark.operators.text import pii_audit, pii_scan, pii_scrub

        d = load_table(spark, sf_dir, "documents").withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(" reach me at a.b@test.io or (212) 555-0100"),
            ),
        )
        audit = {r["doc_id"]: r for r in pii_audit(d).collect()}
        scan = {r["doc_id"]: r for r in pii_scan(d).collect()}
        scrub = {r["doc_id"]: r for r in pii_scrub(d).collect()}
        assert set(audit) == set(scan) == set(scrub)
        for did, row in audit.items():
            assert row["clean_text"] == scrub[did]["clean_text"]
            for c in ("n_email", "n_ssn", "n_phone", "n_ipv4", "pii_total"):
                assert row[c] == scan[did][c], (did, c)

    def test_audit_single_projection_no_shuffle(self, spark, sf_dir):
        from cowsdb_spark.operators.text import pii_audit

        d = load_table(spark, sf_dir, "documents")
        plan = pii_audit(d)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
