"""Algorithmic string codecs ClickHouse ships natively.

base58/base32 treat the whole string as a big integer (base58) or a
5-bit stream (base32) — neither is expressible as a bounded Spark SQL
expression for arbitrary-length input, and punycode/Damerau need real
algorithms.  These are Arrow-batched pandas UDFs: a deliberate
slow-path exception for scalar utility functions that never sit in an
analytical hot loop (the reference gets them from ClickHouse's C++
implementations; ours are the same public algorithms in Python).
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _b58encode(raw: bytes) -> str:
    n = int.from_bytes(raw, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = _B58_ALPHABET[r] + out
    # leading zero bytes encode as leading '1's (Bitcoin convention,
    # which CH follows)
    pad = len(raw) - len(raw.lstrip(b"\0"))
    return "1" * pad + out


def _b58decode(s: str) -> str:
    n = 0
    for c in s:
        n = n * 58 + _B58_ALPHABET.index(c)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("1"))
    return (b"\0" * pad + raw).decode("utf-8", "replace")


def _damerau(a: str, b: str) -> int:
    # textbook optimal-string-alignment distance
    d = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        d[i][0] = i
    for j in range(len(b) + 1):
        d[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return d[len(a)][len(b)]


def _map(fn):
    def inner(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))

    return inner


def _map2(fn):
    def inner(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [None if x is None or y is None else fn(x, y) for x, y in zip(a, b)]
        )

    return inner


def register_all(spark: SparkSession) -> None:
    spark.udf.register(
        "base58Encode", pandas_udf(_map(lambda s: _b58encode(s.encode())), "string")
    )
    spark.udf.register("base58Decode", pandas_udf(_map(_b58decode), "string"))
    spark.udf.register(
        "base32Encode",
        pandas_udf(_map(lambda s: base64.b32encode(s.encode()).decode()), "string"),
    )
    spark.udf.register(
        "base32Decode",
        pandas_udf(
            _map(lambda s: base64.b32decode(s).decode("utf-8", "replace")), "string"
        ),
    )
    spark.udf.register(
        "punycodeEncode",
        pandas_udf(_map(lambda s: s.encode("punycode").decode("ascii")), "string"),
    )
    spark.udf.register(
        "punycodeDecode",
        pandas_udf(_map(lambda s: bytes(s, "ascii").decode("punycode")), "string"),
    )
    spark.udf.register(
        "damerauLevenshteinDistance", pandas_udf(_map2(_damerau), "long")
    )
    # IDNA = lowercase + per-label punycode (Python's built-in codec
    # implements RFC 3490 exactly, matching CH's idna library path)
    spark.udf.register(
        "idnaEncode",
        pandas_udf(_map(lambda s: s.encode("idna").decode("ascii")), "string"),
    )
    spark.udf.register(
        "idnaDecode",
        pandas_udf(_map(lambda s: bytes(s, "ascii").decode("idna")), "string"),
    )

    def _try_idna(s: str) -> str:
        try:
            return s.encode("idna").decode("ascii")
        except Exception:  # noqa: BLE001 — CH tryIdnaEncode contract
            return ""

    spark.udf.register("tryIdnaEncode", pandas_udf(_map(_try_idna), "string"))
