"""Deterministic ClickBench-shaped ``hits_sample`` fixture generator.

Schema: FIXTURES.md §B1 — the trimmed form of the reference CI's
105-column hits DDL (.github/workflows/test.yml:49), extended with
the columns the 43 public ClickBench queries touch (MobilePhone,
IsLink, IsDownload, TraficSourceID, RefererHash, URLHash,
WindowClientWidth, WindowClientHeight).

Generated on demand (seed 42, pure numpy/pyarrow — no Spark), so the
fixture never lives in git. ~100k rows ≈ 6 MB parquet.
"""

from __future__ import annotations

import os

import numpy as np

N_ROWS = 100_000
SEED = 42
DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "hits_sample.parquet")

# constants the point-lookup queries use — planted explicitly below
USER_ID_POINT = 435090932899640449
REFERER_HASH_POINT = 3594120000172545465
URL_HASH_POINT = 2868770270353813622


def _zipf_choice(rng, values, n, a=1.5):
    ranks = rng.zipf(a, size=n)
    return np.asarray(values)[np.minimum(ranks - 1, len(values) - 1)]


def _build_table(n: int, seed: int = SEED, watch_offset: int = 0):
    """One in-memory chunk of the fixture as a pyarrow Table.

    ``watch_offset`` keeps WatchID globally unique across chunks
    (distinct inputs stay distinct under the affine map). All other
    pools are chunk-local: per-chunk rng reseeding makes UserID pools
    disjoint (distinct users scale with chunks) while URL/phrase tail
    ids share the same 0..card-1 range (hot strings repeat across
    chunks, total distinct strings stay at the 10M-realistic level —
    the >10M points isolate row-volume scaling at fixed string
    cardinality)."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    words = np.array(
        "the quick brown fox jumps over lazy dog search phrase click news maps "
        "mail video photo music shop game sport auto home cat".split()
    )

    # Cardinality realism (r4): the first fixture drew strings from
    # tiny fixed pools — 61 distinct URLs / 12.7k titles / 5k users at
    # 10M rows.  Real ClickBench hits has ~1.8M distinct URLs, ~230k
    # phrases and ~120k users per 10M rows; low-cardinality pools let
    # any dictionary-aware engine evaluate string predicates on the
    # dictionary (dozens of comparisons) instead of the data, which is
    # NOT the workload ClickBench represents.  Strings therefore carry
    # a zipf-distributed long-tail id so distinct counts scale with n.
    def phrases(count, empty_frac, tail_card):
        # vectorized: up to 3 words + a long-tail id suffix, masked
        # concatenation (a per-row " ".join loop is minutes at 10M)
        k = rng.integers(1, 4, size=count)
        w = words[rng.integers(0, len(words), size=(count, 3))]
        out = w[:, 0].astype(object)
        m2 = k >= 2
        out[m2] = out[m2] + " " + w[m2, 1]
        m3 = k >= 3
        out[m3] = out[m3] + " " + w[m3, 2]
        tail = _zipf_choice(rng, rng.permutation(max(tail_card, 1)), count, a=1.2)
        out = out + " " + tail.astype(str).astype(object)
        out[rng.random(count) < empty_frac] = ""
        return out

    domains = np.array(
        ["example.com", "google.com", "news.site", "shop.org", "maps.google.com",
         "video.host", "blog.net", "wiki.org", "mail.ru", "images.google.com"]
    )
    path_words = np.array(["index", "page", "search", "item", "story", "watch"])

    def urls(count, empty_frac, tail_card, dom=domains):
        d = _zipf_choice(rng, dom, count)
        p = rng.choice(path_words, size=count)
        # long-tail path id: head URLs repeat (zipf), tail is ~unique
        t = _zipf_choice(rng, rng.permutation(max(tail_card, 1)), count, a=1.2)
        out = (
            np.char.add(
                np.char.add(np.char.add("http://", d.astype(str)), np.char.add("/", p.astype(str))),
                np.char.add("/", t.astype(str)),
            ).astype(object)
        )
        out[rng.random(count) < empty_frac] = ""
        return out

    event_time = np.sort(
        rng.integers(1372636800, 1375315200, size=n)  # 2013-07-01..08-01 UTC
    ).astype("datetime64[s]")
    user_id = _zipf_choice(rng, rng.integers(1, 2**61, size=max(n // 80, 1000)), n, a=1.2)
    user_id[0] = USER_ID_POINT
    referer_hash = rng.integers(0, 2**62, size=n)
    referer_hash[rng.random(n) < 0.001] = REFERER_HASH_POINT
    url_hash = rng.integers(0, 2**62, size=n)
    url_hash[rng.random(n) < 0.001] = URL_HASH_POINT
    counter_id = _zipf_choice(rng, np.arange(1, 1000) * 31 % 997 + 1, n).astype(np.int32)
    counter_id[rng.random(n) < 0.10] = 62  # the ClickBench point counter

    def list_array(lengths, flat, value_type):
        # vectorized list<...> build: offsets + flat values, no per-row
        # Python lists (O(n) loop cost was the 10M-row blocker)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        values = pa.array(flat, type=value_type)
        if isinstance(values, pa.ChunkedArray):  # large inputs chunk
            values = values.combine_chunks()
        return pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), values
        )

    pp_len = rng.integers(0, 4, size=n)
    pp_total = int(pp_len.sum())
    # per-row key index k0..k{l-1}: global position minus row start
    pp_starts = np.repeat(np.cumsum(pp_len) - pp_len, pp_len)
    pp_pos = np.arange(pp_total) - pp_starts
    pp_keys = list_array(
        pp_len, np.char.add("k", pp_pos.astype(str)), pa.string()
    )
    pp_vals = list_array(pp_len, rng.random(pp_total).round(3), pa.float64())

    mobile_model = np.where(
        rng.random(n) < 0.9, "", _zipf_choice(rng, np.array(["iPhone", "Galaxy", "Pixel", "Nokia"]), n)
    ).astype(object)

    cols = {
        "WatchID": np.arange(
            watch_offset + 1, watch_offset + n + 1, dtype=np.int64
        ) * 977 + 11,
        "JavaEnable": rng.integers(0, 2, size=n).astype(np.int16),
        "Title": phrases(n, 0.30, n // 20),
        "EventTime": event_time,
        "EventDate": event_time.astype("datetime64[D]"),
        "CounterID": counter_id,
        "ClientIP": rng.integers(0, 2**32, size=n),
        "RegionID": _zipf_choice(rng, np.arange(1, 200), n).astype(np.int32),
        "UserID": user_id,
        "OS": rng.integers(0, 12, size=n).astype(np.int16),
        "URL": urls(n, 0.05, n // 5),
        "Referer": urls(n, 0.25, n // 10),
        "IsRefresh": (rng.random(n) < 0.05).astype(np.int16),
        "RefererCategories": (lambda L: list_array(
            L, rng.integers(0, 100, size=int(L.sum())).astype(np.int32), pa.int32()
        ))(rng.integers(0, 6, size=n)),
        "ResolutionWidth": rng.choice([1024, 1280, 1368, 1440, 1920, 2560], size=n).astype(np.int32),
        "SearchEngineID": rng.choice([0, 0, 0, 2, 3, 13, 49], size=n).astype(np.int32),
        "SearchPhrase": phrases(n, 0.70, n // 40),
        "AdvEngineID": np.where(rng.random(n) < 0.95, 0, rng.integers(1, 30, size=n)).astype(np.int16),
        "DontCountHits": (rng.random(n) < 0.02).astype(np.int16),
        "MobilePhone": np.where(mobile_model == "", 0, rng.integers(1, 6, size=n)).astype(np.int16),
        "MobilePhoneModel": mobile_model,
        "BrowserLanguage": rng.choice(["en", "de", "fr", "ru", "es"], size=n),
        "ParamPrice": rng.integers(-1000, 100000, size=n),
        "GoalsReached": (lambda L: list_array(
            L, rng.integers(1, 50, size=int(L.sum())).astype(np.int32), pa.int32()
        ))(rng.integers(0, 4, size=n)),
        "ParsedParamsKey1": pp_keys,
        "ParsedParamsValueDouble": pp_vals,
        "RefererHash": referer_hash,
        "URLHash": url_hash,
        "IsLink": (rng.random(n) < 0.15).astype(np.int16),
        "IsDownload": (rng.random(n) < 0.02).astype(np.int16),
        "TraficSourceID": rng.choice([-1, 0, 1, 2, 3, 6, 8], size=n).astype(np.int16),
        "WindowClientWidth": rng.choice([0, 1024, 1280, 1366, 1920], size=n).astype(np.int32),
        "WindowClientHeight": rng.choice([0, 600, 720, 768, 1080], size=n).astype(np.int32),
    }
    schema = pa.schema(
        [
            ("WatchID", pa.int64()),
            ("JavaEnable", pa.int16()),
            ("Title", pa.string()),
            ("EventTime", pa.timestamp("us")),
            ("EventDate", pa.date32()),
            ("CounterID", pa.int32()),
            ("ClientIP", pa.int64()),
            ("RegionID", pa.int32()),
            ("UserID", pa.int64()),
            ("OS", pa.int16()),
            ("URL", pa.string()),
            ("Referer", pa.string()),
            ("IsRefresh", pa.int16()),
            ("RefererCategories", pa.list_(pa.int32())),
            ("ResolutionWidth", pa.int32()),
            ("SearchEngineID", pa.int32()),
            ("SearchPhrase", pa.string()),
            ("AdvEngineID", pa.int16()),
            ("DontCountHits", pa.int16()),
            ("MobilePhone", pa.int16()),
            ("MobilePhoneModel", pa.string()),
            ("BrowserLanguage", pa.string()),
            ("ParamPrice", pa.int64()),
            ("GoalsReached", pa.list_(pa.int32())),
            ("ParsedParamsKey1", pa.list_(pa.string())),
            ("ParsedParamsValueDouble", pa.list_(pa.float64())),
            ("RefererHash", pa.int64()),
            ("URLHash", pa.int64()),
            ("IsLink", pa.int16()),
            ("IsDownload", pa.int16()),
            ("TraficSourceID", pa.int16()),
            ("WindowClientWidth", pa.int32()),
            ("WindowClientHeight", pa.int32()),
        ]
    )
    arrays = [
        cols[f.name]
        if isinstance(cols[f.name], pa.Array)
        else pa.array(cols[f.name], type=f.type)
        for f in schema
    ]
    return pa.Table.from_arrays(arrays, schema=schema)


# A chunk this size peaks around a few GB during the numpy build; the
# 100M fixture streams ten of them through one ParquetWriter instead
# of holding 100M Python string objects at once.
CHUNK_ROWS = 10_000_000


def generate(path: str = DEFAULT_PATH, n: int = N_ROWS) -> str:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # Row groups are the scan-parallelism quantum for BOTH engines
    # (Spark assigns row groups to tasks by split midpoint; DuckDB
    # parallelizes over row groups). 1M-row groups left a 10M-row file
    # with only 10 groups — 10 busy cores out of 32. 256k rows/group
    # (~15 MB) gives 38 groups at 10M: every core works, and the size
    # still matches a sane 100 TB layout (~16-64 MB groups).
    rg = 32768 if n <= 1_000_000 else 1 << 18
    if n <= CHUNK_ROWS:
        # single-chunk path: byte-identical to the pre-chunking layout
        pq.write_table(_build_table(n), path, row_group_size=rg)
        return path
    writer = None
    try:
        done = 0
        i = 0
        while done < n:
            m = min(CHUNK_ROWS, n - done)
            # per-chunk seed: disjoint UserID pools, fresh tails;
            # EventTime sorts within a chunk — the file is ten sorted
            # runs, the layout a 10-part MergeTree ingest produces
            t = _build_table(m, seed=SEED + i, watch_offset=done)
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema)
            writer.write_table(t, row_group_size=rg)
            done += m
            i += 1
    finally:
        if writer is not None:
            writer.close()
    return path


def ensure_hits(path: str = DEFAULT_PATH, n: int = N_ROWS) -> str:
    path = os.path.abspath(path)
    if not os.path.exists(path):
        generate(path, n)
    return path


def ensure_hits_1m() -> str:
    """1M-row point for the scale-up bench sweep (per-query work above
    Spark's ~0.2-0.5s scheduling floor, so engine-vs-baseline ratios
    carry signal)."""
    path = os.path.join(
        os.path.dirname(DEFAULT_PATH), "hits_1m.parquet"
    )
    return ensure_hits(path, n=1_000_000)


def ensure_hits_10m() -> str:
    """10M-row point (VERDICT r2 #5): 1M still sat at the scheduling
    floor (~0.28s/query); at 10M the heavy ClickBench queries do >=1s
    of real work per pass, so the ratio vs DuckDB carries signal."""
    path = os.path.join(
        os.path.dirname(DEFAULT_PATH), "hits_10m.parquet"
    )
    return ensure_hits(path, n=10_000_000)


def ensure_hits_100m() -> str:
    """100M-row point (~7.7 GB parquet): the amortization claim made
    measurable — per-query scheduling floor is ~2% of runtime here, so
    the Spark/DuckDB ratio reflects per-row efficiency and shuffle
    discipline, the quantities that survive a 1000x scale-up."""
    path = os.path.join(
        os.path.dirname(DEFAULT_PATH), "hits_100m.parquet"
    )
    return ensure_hits(path, n=100_000_000)


if __name__ == "__main__":
    import sys

    print(ensure_hits(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_PATH))
