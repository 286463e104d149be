"""Deterministic synthetic document corpus for dedup-pipeline scale
runs (VERDICT r4 #4: "exercise the dedup path at real size").

Shape: (doc_id long, text string). Each document is 5 phrases of 8
words drawn from a 50k-phrase pool (most documents globally unique).
Within every 1M-row batch, the last 10% of rows duplicate earlier
rows: 4% byte-exact copies, 6% near-duplicates (one of the five
phrases re-randomized → word-5-shingle Jaccard ≈ 0.63, above the
pipeline's 0.5 threshold and detectable by 8×4 LSH banding with
p≈0.8 per pair).

v2 (r9, VERDICT r8 #2): rows whose doc_id ≡ 3 (mod 10) are a
PROSE-LIKE subpopulation — 5 phrases of 12 words sampled from the
token stream of quality_model.GOOD (natural stopword frequency and
sentence punctuation, 60 words/doc ≥ Gopher's 50-word floor) — so
the funnel's trained-classifier / Gopher audit separates
populations instead of rejecting 10M word-salad rows wholesale
(probe: classifier keeps ~100% of prose / 0% of salad; Gopher
passes ~97% / 0%). Planted duplicates copy their source row's
population, so the prose fraction stays ≈10% post-planting and the
dedup rates are unchanged. Near-dups of prose docs swap a phrase
WITHIN the prose pool (population-pure, Jaccard still above the
0.5 gate).

Pure numpy + pyarrow (no Spark), generated in 1M-row batches so
generation stays vectorized and memory-bounded at 10M rows — the
same constraints as tools/gen_hits.py — but written in 64k-row row
groups (~12 MB): Spark splits parquet scans at row-group boundaries,
and a 1M-row group made the whole 1M-doc corpus a single task (one
straggler thread doing 100% of every scan-bound stage).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 7
N_PHRASES = 50_000
PHRASE_WORDS = 8
DOC_PHRASES = 5
N_PROSE_PHRASES = 20_000
PROSE_PHRASE_WORDS = 12
PROSE_MOD = 10  # doc_id % 10 == 3 → prose row (~10%)
BATCH = 1_000_000
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _phrase_pool(rng) -> np.ndarray:
    words = np.array([f"w{i:05d}" for i in range(20_000)])
    idx = rng.integers(0, len(words), size=(N_PHRASES, PHRASE_WORDS))
    return np.array([" ".join(ws) for ws in words[idx]])


def _prose_pool(rng) -> np.ndarray:
    """12-word phrases sampled from the token STREAM (not the distinct
    vocabulary) of quality_model's GOOD corpus, preserving its natural
    stopword frequency (~19% Gopher stops) and attached punctuation."""
    from cowsdb_spark.operators.quality_model import GOOD

    stream = np.array([w for s in GOOD for w in s.lower().split(" ")])
    idx = rng.integers(0, len(stream), size=(N_PROSE_PHRASES, PROSE_PHRASE_WORDS))
    return np.array([" ".join(ws) for ws in stream[idx]])


def generate(path: str | None = None, n: int = 10_000_000) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if path is None:
        # cache keyed on n — a 1M-doc run must not satisfy a 10M ask;
        # v2 suffix: the prose subpopulation changed the distribution,
        # a stale v1 cache must not satisfy a v2 ask
        path = os.path.join(FIXTURE_DIR, f"docs_v2_{n}.parquet")
    path = os.path.abspath(path)
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(SEED)
    # combined pool: salad phrases occupy [0, N_PHRASES), prose
    # phrases [N_PHRASES, N_PHRASES + N_PROSE_PHRASES) — a row's
    # population is fully determined by its phrase indices, so the
    # dup-planting idx copies below inherit the source's population
    phrases = np.concatenate([_phrase_pool(rng), _prose_pool(rng)])
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    tmp = path + ".tmp"
    writer = pq.ParquetWriter(tmp, schema, compression="snappy")
    import pyarrow.compute as pc

    done = 0
    while done < n:
        m = min(BATCH, n - done)
        idx = rng.integers(0, N_PHRASES, size=(m, DOC_PHRASES))
        # prose subpopulation: doc_id % 10 == 3 rows draw from the
        # prose phrase range instead (rows later overwritten by the
        # dup planting simply take their source's population)
        prose_rows = np.nonzero((np.arange(done, done + m) % PROSE_MOD) == 3)[0]
        idx[prose_rows] = N_PHRASES + rng.integers(
            0, N_PROSE_PHRASES, size=(len(prose_rows), DOC_PHRASES)
        )
        # duplicate planting: last 10% copy from the first 90%
        n_dup = m // 10
        src = rng.integers(0, m - n_dup, size=n_dup)
        idx[m - n_dup :] = idx[src]
        # 60% of the planted rows become NEAR dups (one phrase swapped
        # within the source row's own population)
        n_near = (n_dup * 6) // 10
        near_rows = np.arange(m - n_dup, m - n_dup + n_near)
        pos = rng.integers(0, DOC_PHRASES, size=n_near)
        swap_salad = rng.integers(0, N_PHRASES, size=n_near)
        swap_prose = N_PHRASES + rng.integers(0, N_PROSE_PHRASES, size=n_near)
        src_is_prose = idx[near_rows].max(axis=1) >= N_PHRASES
        idx[near_rows, pos] = np.where(src_is_prose, swap_prose, swap_salad)
        cols = [pa.array(phrases[idx[:, j]]) for j in range(DOC_PHRASES)]
        text = pc.binary_join_element_wise(*cols, " ")
        ids = pa.array(np.arange(done, done + m, dtype=np.int64))
        writer.write_table(
            pa.table({"doc_id": ids, "text": text}), row_group_size=65_536
        )
        done += m
    writer.close()
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    print(generate(n=n))
