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


def register_all(spark: SparkSession) -> None:
    # pandas_udf needs an active session — decorate at register time,
    # not import time
    spark.udf.register("intHash32", pandas_udf(_int_hash32, "long"))
    spark.udf.register("intHash64", pandas_udf(_int_hash64, "long"))
