"""SemDeDup-style semantic deduplication over embedding columns.

Public-knowledge basis: SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) — partition the embedding space into clusters,
then inside each cluster drop every document whose cosine similarity
to an EARLIER kept-candidate exceeds a threshold. Cross-cluster
near-duplicates are deliberately not searched: bounding the pairwise
stage to clusters is exactly what makes the method near-linear, and
that recall tradeoff is the published algorithm, not a shortcut.

This module uses deterministic seed clustering (the k lowest-id
vectors are the centroids) rather than sampled k-means so the whole
pipeline is reproducible and oracle-comparable; a k-means refinement
would only move the cluster boundaries, not the dedup rule. The
keep-rule is "drop b iff some same-cluster a with a.id < b.id has
cos(a,b) >= tau" — order-based, deterministic, and expressible as a
single self-join (SemDeDup's keep-one-per-similar-group up to the
non-transitivity both it and this rule share).

Spark-first / 100 TB design:

- **Assignment is map-side only.** The k seed vectors ride along as
  one literal array-of-arrays column; each row's argmax-cosine is a
  ``transform`` + left-to-right ``aggregate`` fold over that array
  (JVM codegen). No crossJoin, no shuffle, no Python — the seed
  fetch is one bounded k-row collect (same bounded-collect budget as
  similarity.py's IVF train sample).
- **The pairwise stage shuffles on the cluster key only.** The
  within-cluster self-join is an equi-join on ``cluster``; pair
  volume is O(sum m_k^2) — SemDeDup's actual cost model. At corpus
  scale k grows with n (clusters of ~1-5k members), so per-cluster
  work and per-task memory stay constant while the only shuffle is
  the cluster-key co-location. With small k the join is skewed by
  construction (k distinct keys); callers at scale pick k, not this
  module.
- **Float discipline.** All cosines are sequential left-to-right
  double folds with per-vector precomputed norms —
  ``dot(a,b)/(norm_a*norm_b)`` — the construction
  operators/dedup.py::embedding_neardup_pairs already hash-matches
  against DuckDB's ``list_cosine_similarity`` on these fixtures.
  Argmax ties (bit-equal cosines to two seeds) resolve to the lower
  seed index on both engines: the fold keeps the incumbent on
  non-strict comparison; the oracle orders by ``c DESC, sidx``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _to_double, dot_nm, norm_nm


def seed_vectors(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """The k lowest-id embedding vectors as double lists (one bounded
    k-row collect — the deterministic analogue of an IVF train
    sample)."""
    rows = (
        emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("_v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(rows)}")
    return [list(r["_v"]) for r in rows]


def assign_seed_clusters(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "fold",
    seeds: list[list[float]] | None = None,
) -> DataFrame:
    """(id_col, _e, _v, _nv, _cluster): nearest-seed cluster per
    vector (fold mode; gemm mode has no ``_e``). ``seeds`` lets the
    caller reuse an existing ``seed_vectors`` collect instead of
    re-running it.

    ``mode="fold"`` (oracle tier) — map-side only: the per-row plan
    is a transform over the k-seed literal producing (cosine, index)
    structs, then a left-to-right fold keeping the strict maximum
    (ties → earlier = lower index). Seed norms are recomputed by the
    same JVM fold as row norms so every float comes from one
    summation order. Right choice for small k; per-row cost is
    O(k·dim) of non-SIMD fold arithmetic.

    ``mode="gemm"`` (scale tier) — corpus-scale k (SemDeDup uses
    clusters of ~1-5k members, i.e. k ≈ n/1000): one ``mapInPandas``
    pass, each Arrow batch assigned by a single numpy
    (batch × dim)·(dim × k) matmul against the unit-normalized seed
    matrix (shipped in the task closure, k·dim doubles). Still zero
    shuffle; numpy's pairwise summation differs from the fold in
    ULPs, so the oracle tier stays "fold".
    """
    if mode == "gemm":
        return _assign_gemm(emb, k, id_col, vec_col)
    if seeds is None:
        seeds = seed_vectors(emb, k, id_col, vec_col)
    dim = len(seeds[0])
    # `_e` (raw float array) rides along so downstream pair stages can
    # run static-dim expansions off a scan attribute (see the
    # structural rule at similarity.py's helpers); `_nv` itself is
    # such an expansion — bit-identical to the `_v` fold.
    base = (
        emb.select(F.col(id_col), F.col(vec_col).alias("_e"))
        .withColumn("_v", F.expr("transform(_e, x -> cast(x as double))"))
        .withColumn("_nv", norm_nm("_e", dim, cast_elements=True))
    )
    # NOTE (r9): an unrolled per-seed-cosine projection was prototyped
    # here and measured SLOWER than this fold (warm noop 1.45 s vs
    # 0.87 s at sf0.1) on top of a 35x plan-construction cost — the
    # k·dim-term generated method defeats codegen on this shape. The
    # assignment is O(n·k·dim) map-side work, an order of magnitude
    # below the pair stage, so the fold stays; the expansion is
    # applied where it measured faster (the pair stage below).
    #
    # r9 build-cost fix: the fold is ONE SQL string (py4j charged per
    # Column-op node; the k×dim literal array alone was ~520 round
    # trips ≈ 0.4 s per query build), and the per-seed norms are
    # precomputed driver-side with the fold's exact op sequence
    # (norm_py — correctly-rounded IEEE, identical bits) instead of
    # re-folding sqrt(dot(seed,seed)) per ROW inside the lambda,
    # which interpreted k×dim extra element ops per row.
    from .similarity import _arr_sql, norm_py

    seeds_sql = "array(" + ", ".join(_arr_sql(s) for s in seeds) + ")"
    snorms_sql = _arr_sql([norm_py(s) for s in seeds])
    cand = (
        f"transform(sequence(1, {k}), i -> named_struct("
        "'c', aggregate(zip_with(_v, element_at("
        f"{seeds_sql}, i), (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v) "
        f"/ (_nv * element_at({snorms_sql}, i)), "
        "'i', i - 1))"
    )
    best = (
        f"aggregate(slice({cand}, 2, {k - 1}), element_at({cand}, 1), "
        "(acc, x) -> CASE WHEN x.c > acc.c THEN x ELSE acc END)"
    )
    return base.withColumn("_cluster", F.expr(f"cast(({best}).i as int)"))


def _assign_gemm(
    emb: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    import numpy as np
    import pandas as pd

    seeds = np.asarray(seed_vectors(emb, k, id_col, vec_col), dtype=np.float64)
    snorm = np.linalg.norm(seeds, axis=1)
    snorm[snorm == 0] = 1e-12
    unit_seeds = seeds / snorm[:, None]

    def assign(batches):
        for pdf in batches:
            v = np.array(list(pdf["_v"]), dtype=np.float64)
            n = np.linalg.norm(v, axis=1)
            n[n == 0] = 1e-12
            cos = (v / n[:, None]) @ unit_seeds.T
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "_v": pdf["_v"].values,
                    "_nv": n,
                    "_cluster": cos.argmax(axis=1).astype("int32"),
                }
            )

    base = emb.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    schema = (
        f"{id_col} long, _v array<double>, _nv double, _cluster int"
    )
    return base.mapInPandas(assign, schema=schema)


def _gemm_dropped(assigned: DataFrame, tau: float, id_col: str) -> DataFrame:
    """Per-cluster dropped ids via blocked numpy GEMM (applyInPandas
    group per cluster — the same shuffle key as the fold tier's
    self-join, but O(m²) similarity work runs as matmuls instead of
    m² joined rows). Row/column blocking bounds peak memory at
    O(block²) per task regardless of cluster skew."""
    import numpy as np
    import pandas as pd

    # only these four columns cross the Arrow boundary (the caller's
    # frame may carry extra lanes, e.g. the raw `_e` array)
    assigned = assigned.select(id_col, "_cluster", "_v", "_nv")

    B = 2048

    def drop_ids(pdf):
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        v = np.array(list(pdf["_v"]), dtype=np.float64)
        n = pdf["_nv"].to_numpy().copy()
        # Zero-clamp like _assign_gemm: via the kmeans path _nv is the
        # raw norm, so a zero vector would divide-by-zero into NaN
        # similarity rows (never droppable) — ADVICE r7.
        n[n == 0] = 1e-12
        v = v / n[:, None]
        m = len(ids)
        dropped = np.zeros(m, dtype=bool)
        for s in range(0, m, B):
            e = min(s + B, m)
            col = v[s:e]
            acc = np.zeros(e - s, dtype=bool)
            jj = np.arange(s, e)[None, :]
            for rs in range(0, e, B):
                re_ = min(rs + B, e)
                sims = v[rs:re_] @ col.T
                ii = np.arange(rs, re_)[:, None]
                acc |= ((sims >= tau) & (ii < jj)).any(axis=0)
            dropped[s:e] = acc
        return pd.DataFrame({id_col: ids[dropped]})

    return (
        assigned.select(id_col, "_v", "_nv", "_cluster")
        .groupBy("_cluster")
        .applyInPandas(drop_ids, schema=f"{id_col} long")
        .withColumn("_dropped", F.lit(1))
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    tau: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "auto",
    clustering: str = "seeds",
) -> DataFrame:
    """(id_col, cluster int, is_kept int), one row per input vector.

    is_kept = 0 iff some same-cluster vector with a smaller id has
    cosine >= tau with this one. The only wide exchange is the
    cluster-key repartition; the dropped-id set re-attaches through a
    left join AQE broadcasts when small.

    ``mode``: "fold" = JVM higher-order-function tier, bit-matched to
    a sequential-summation SQL oracle; "gemm" = numpy matmul tier
    (Arrow batches; assignment map-side, pair stage one
    applyInPandas group per cluster) for corpus-scale k where fold
    arithmetic doesn't amortize; "auto" = fold for small seed-based
    k (the oracle/driver regime), gemm beyond.

    ``clustering``: "seeds" = deterministic k-lowest-id centroids
    (reproducible, oracle-comparable); "kmeans" = the published
    SemDeDup construction — Lloyd centroids from similarity.py's
    ``ivf_build`` (bounded driver-side train sample, distributed
    JVM/GEMM assignment), trading bit-reproducibility across engines
    for real cluster geometry. The dedup rule downstream is
    identical for both.
    """
    if mode == "auto":
        mode = "fold" if (k <= 32 and clustering == "seeds") else "gemm"
    dim: int | None = None
    if clustering == "kmeans":
        from .similarity import ivf_build

        ivf_assigned, _cents = ivf_build(
            emb, n_centroids=k, id_col=id_col, vec_col=vec_col
        )
        dim = len(_cents[0]) if _cents else None
        # both lanes ride along: `_e` for the fold tier's expansion
        # pair stage, `_v` for the gemm tier's Arrow hop — column
        # pruning keeps exactly one of them in either physical plan
        assigned = ivf_assigned.select(
            F.col(id_col),
            F.col("_e"),
            F.col("_v"),
            norm_nm("_e", dim, cast_elements=True).alias("_nv"),
            F.col("_cell").cast("int").alias("_cluster"),
        )
    else:
        fold_seeds = (
            seed_vectors(emb, k, id_col, vec_col) if mode == "fold" else None
        )
        assigned = assign_seed_clusters(
            emb, k, id_col, vec_col, mode=mode, seeds=fold_seeds
        )
        if fold_seeds is not None:
            dim = len(fold_seeds[0])
    # r9: materialize the assignment ONCE (lazy localCheckpoint, the
    # dedup.py:328 pattern) — without it the scan→assignment pipeline
    # re-executes per consumer: both sides of the pair self-join plus
    # the final re-attach join, i.e. 3× the assignment cost (measured
    # 3.9→1.3 s at sf0.1, identical rows). Columns are pruned per
    # mode BEFORE the checkpoint so only one vector lane materializes.
    if mode == "gemm":
        assigned = assigned.select(
            id_col, "_cluster", "_v", "_nv"
        ).localCheckpoint(eager=False)
        dropped = _gemm_dropped(assigned, tau, id_col)
        return assigned.join(dropped, id_col, "left").select(
            F.col(id_col),
            F.col("_cluster").alias("cluster"),
            F.when(F.col("_dropped").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_kept"),
        )
    assigned = assigned.select(
        id_col, "_cluster", "_e", "_nv"
    ).localCheckpoint(eager=False)
    a = assigned.select(
        F.col(id_col).alias("_ida"),
        F.col("_cluster").alias("_cl"),
        F.col("_e").alias("_ea"),
        F.col("_nv").alias("_na"),
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"),
        F.col("_cluster").alias("_cl"),
        F.col("_e").alias("_eb"),
        F.col("_nv").alias("_nb"),
    )
    # static-dim expansion keeps the O(pairs · dim) similarity
    # arithmetic — the operator's dominant cost — in whole-stage
    # codegen, indexed off the RAW arrays (structural rule at
    # similarity.py's helpers); bit-identical to the `_v` fold, and
    # the cluster-key shuffle now carries float arrays — half the
    # bytes per vector
    cos = dot_nm("_ea", "_eb", dim, cast_elements=True) / (
        F.col("_na") * F.col("_nb")
    )
    dropped = (
        a.join(b, "_cl")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= F.lit(tau))
        .select(F.col("_idb").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return assigned.join(dropped, id_col, "left").select(
        F.col(id_col),
        F.col("_cluster").alias("cluster"),
        F.when(F.col("_dropped").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_kept"),
    )
