"""ClickHouse hash functions as Arrow-batched pandas UDFs.

``intHash32``/``intHash64`` appear in the reference's MergeTree DDL
(ORDER BY / SAMPLE BY, test.yml:49). As physical-layout keys their
exact values never surface in results, but we implement the real
algorithms (public ClickHouse source, base/base/hex.h lineage /
Common/HashTable/Hash.h) so ORDER BY intHash32(c) sorts identically
to ClickHouse. numpy uint64 arithmetic wraps naturally — exactly
the C semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.pandas.functions import pandas_udf


def _int_hash64_np(x: np.ndarray) -> np.ndarray:
    """CH intHash64: the finalizer of MurmurHash64 (Hash.h)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64).copy()
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def _int_hash32_np(x: np.ndarray, salt: int = 0) -> np.ndarray:
    """CH intHash32: Thomas Wang 64→32 bit mix (Hash.h)."""
    with np.errstate(over="ignore"):
        key = x.astype(np.uint64) ^ np.uint64(salt)
        key = (~key) + (key << np.uint64(18))
        key = key ^ ((key >> np.uint64(31)) | (key << np.uint64(33)))
        key = key * np.uint64(21)
        key = key ^ ((key >> np.uint64(11)) | (key << np.uint64(53)))
        key = key + (key << np.uint64(6))
        key = key ^ ((key >> np.uint64(22)) | (key << np.uint64(42)))
    return key & np.uint64(0xFFFFFFFF)


def _int_hash64(s: pd.Series) -> pd.Series:
    vals = s.fillna(0).to_numpy(dtype=np.int64)
    return pd.Series(_int_hash64_np(vals).astype(np.int64))


def _int_hash32(s: pd.Series) -> pd.Series:
    vals = s.fillna(0).to_numpy(dtype=np.int64)
    return pd.Series(_int_hash32_np(vals).astype(np.int64))


_XXH_P1 = 2654435761
_XXH_P2 = 2246822519
_XXH_P3 = 3266489917
_XXH_P4 = 668265263
_XXH_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _xxh32_bytes(data: bytes, seed: int = 0) -> int:
    """Reference xxHash32 (public spec, github.com/Cyan4973/xxHash);
    CH's xxHash32 is this algorithm with seed 0."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _XXH_P1 + _XXH_P2) & _M32
        v2 = (seed + _XXH_P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XXH_P1) & _M32
        while i + 16 <= n:
            for vi in range(4):
                lane = int.from_bytes(data[i : i + 4], "little")
                v = (v1, v2, v3, v4)[vi]
                v = (v + lane * _XXH_P2) & _M32
                v = (_rotl32(v, 13) * _XXH_P1) & _M32
                if vi == 0:
                    v1 = v
                elif vi == 1:
                    v2 = v
                elif vi == 2:
                    v3 = v
                else:
                    v4 = v
                i += 4
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _XXH_P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _XXH_P3) & _M32
        h = (_rotl32(h, 17) * _XXH_P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _XXH_P5) & _M32
        h = (_rotl32(h, 11) * _XXH_P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _XXH_P2) & _M32
    h ^= h >> 13
    h = (h * _XXH_P3) & _M32
    h ^= h >> 16
    return h


def _xx_hash32(s: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if v is None else _xxh32_bytes(str(v).encode("utf-8"))
            for v in s
        ],
        dtype="Int64",
    )


def register_all(spark: SparkSession) -> None:
    # pandas_udf needs an active session — decorate at register time,
    # not import time
    spark.udf.register("intHash32", pandas_udf(_int_hash32, "long"))
    spark.udf.register("intHash64", pandas_udf(_int_hash64, "long"))
    spark.udf.register("xxHash32", pandas_udf(_xx_hash32, "long"))
