"""Deterministic synthetic document corpus for dedup-pipeline scale
runs (VERDICT r4 #4: "exercise the dedup path at real size").

Shape: (doc_id long, text string). Each document is 5 phrases of 8
words drawn from a 50k-phrase pool (most documents globally unique).
Within every 1M-row batch, the last 10% of rows duplicate earlier
rows: 4% byte-exact copies, 6% near-duplicates (one of the five
phrases re-randomized → word-5-shingle Jaccard ≈ 0.63, above the
pipeline's 0.5 threshold and detectable by 8×4 LSH banding with
p≈0.8 per pair).

Pure numpy + pyarrow (no Spark), generated in 1M-row batches so
generation stays vectorized and memory-bounded at 10M rows — the
same constraints as tools/gen_hits.py — but written in 64k-row row
groups (~12 MB): Spark splits parquet scans at row-group boundaries,
and a 1M-row group made the whole 1M-doc corpus a single task (one
straggler thread doing 100% of every scan-bound stage).
"""

from __future__ import annotations

import os

import numpy as np

SEED = 7
N_PHRASES = 50_000
PHRASE_WORDS = 8
DOC_PHRASES = 5
BATCH = 1_000_000
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def _phrase_pool(rng) -> np.ndarray:
    words = np.array([f"w{i:05d}" for i in range(20_000)])
    idx = rng.integers(0, len(words), size=(N_PHRASES, PHRASE_WORDS))
    return np.array([" ".join(ws) for ws in words[idx]])


def generate(path: str | None = None, n: int = 10_000_000) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if path is None:
        # cache keyed on n — a 1M-doc run must not satisfy a 10M ask
        path = os.path.join(FIXTURE_DIR, f"docs_{n}.parquet")
    path = os.path.abspath(path)
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(SEED)
    phrases = _phrase_pool(rng)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    tmp = path + ".tmp"
    writer = pq.ParquetWriter(tmp, schema, compression="snappy")
    import pyarrow.compute as pc

    done = 0
    while done < n:
        m = min(BATCH, n - done)
        idx = rng.integers(0, N_PHRASES, size=(m, DOC_PHRASES))
        # duplicate planting: last 10% copy from the first 90%
        n_dup = m // 10
        src = rng.integers(0, m - n_dup, size=n_dup)
        idx[m - n_dup :] = idx[src]
        # 60% of the planted rows become NEAR dups (one phrase swapped)
        n_near = (n_dup * 6) // 10
        near_rows = np.arange(m - n_dup, m - n_dup + n_near)
        pos = rng.integers(0, DOC_PHRASES, size=n_near)
        idx[near_rows, pos] = rng.integers(0, N_PHRASES, size=n_near)
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
