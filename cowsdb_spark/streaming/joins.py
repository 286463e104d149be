"""Streaming joins (SURVEY §2 STRM tier; reference parity target is
the streaming extension, beyond the reference's own batch engine).

Two shapes a 100 TB/day feed needs:

- **stream-static enrichment**: each micro-batch joins a (small)
  dimension snapshot. The dimension broadcasts, so the stream never
  shuffles for the join — the enrich cost is O(batch), state is zero.
- **stream-stream interval join**: both sides watermarked, the join
  range-bounded on event time. Spark buffers each side's rows in
  keyed state ONLY until the watermark passes the interval bound, so
  state is O(rate x interval), not O(stream) — the property that
  keeps a day-scale feed joinable on a fixed-size cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Enrich a stream with a static dimension: broadcast hash join
    per micro-batch; no streaming state, no stream shuffle."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner join of two streams on ``key`` where the right row lands
    within ``[left_ts - within, left_ts + within]``.

    Both inputs get event-time watermarks; together with the interval
    condition that lets Spark expire buffered rows — each side's state
    holds at most (watermark + within) of data per key partition.
    Column collisions from the right side are suffixed ``_r``.
    """
    lw = left.withWatermark(left_ts, watermark)
    taken = set(left.columns)
    renames = [
        (c, f"{c}_r") for c in right.columns
        if c in taken and c not in (key,)
    ]
    rw = right
    for old, new in renames:
        rw = rw.withColumnRenamed(old, new)
    rts = f"{right_ts}_r" if (right_ts, f"{right_ts}_r") in renames else right_ts
    rw = rw.withWatermark(rts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[rts] >= F.expr(f"{left_ts} - INTERVAL {within}"))
        & (rw[rts] <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def stream_neardup_candidates(
    stream_docs: DataFrame,
    store_banded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming near-dup SCREEN against a persisted signature store
    (the r8 incremental-dedup store, live): each micro-batch's docs
    are MinHash-signed and banded — all narrow stateless projections,
    legal on a streaming frame — and joined with the store's
    ``banded_keys`` table on (band, bh). One row out per band
    collision: (id, seen_id, band), i.e. "this incoming doc probably
    near-duplicates that stored doc".

    Same constants/banding as the batch operators, so the emitted
    candidates equal the new×seen candidate stage of
    ``minhash_lsh_pairs_incremental`` run on the same rows (asserted
    streaming-equals-batch in tests). Banding is the usual LSH
    S-curve screen — exact-agreement verification belongs downstream
    (foreachBatch with the batch kernel, or an offline join), where
    the signatures can be re-attached.

    Scale shape: ZERO streaming state (stream-static inner join); the
    stream side shuffles slim (band, bh, id) keys only; when the
    store table is bucketed by (band, bh) the store side co-locates
    with no exchange — identical economics to the batch increment.
    """
    from ..operators.dedup import banded_keys, minhash_signature_table

    sig = minhash_signature_table(
        stream_docs, id_col, text_col, n_hashes, shingle_k, hash_fn
    )
    keys = banded_keys(sig, id_col, n_hashes, bands)
    store = store_banded.select(
        F.col(id_col).alias("seen_id"), "band", "bh"
    )
    return keys.join(store, ["band", "bh"], "inner").select(
        id_col, "seen_id", "band"
    )
