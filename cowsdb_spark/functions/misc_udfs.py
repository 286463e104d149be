"""Python-backed scalar spellings with no JVM-expressible core.

geohash encode/decode (bit-interleaved base-32), Unicode normalization
(needs the full Unicode database), and Jaro/Jaro-Winkler similarity
(iterative two-pass match/transposition scan). All are Arrow-batched
pandas UDFs — per-batch Python cost, never per-row serialization — and
all are scalar utility spellings outside any hot aggregation path (the
hot-path text operators in operators/text.py stay pure-JVM).

Reference surface: chDB delegate (reference main.py:190); the CH
spellings are geohashEncode/geohashDecode/normalizeUTF8NFC/…/
jaroSimilarity/jaroWinklerSimilarity.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.pandas.functions import pandas_udf

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode_one(lon: float, lat: float, precision: int) -> str:
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True  # longitude first
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_B32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def _geohash_decode_one(s: str) -> tuple[float, float]:
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in s:
        idx = _B32.find(c)
        if idx < 0:
            return (0.0, 0.0)
        for shift in range(4, -1, -1):
            bit = (idx >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return ((lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2)


def _jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler(a: str, b: str) -> float:
    j = _jaro(a, b)
    prefix = 0
    for x, y in zip(a, b):
        if x != y or prefix == 4:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def register_all(spark: SparkSession) -> None:
    @pandas_udf("string")
    def _geohash_encode(lon: pd.Series, lat: pd.Series, prec: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _geohash_encode_one(
                    float(x if x == x else 0.0),
                    float(y if y == y else 0.0),
                    int(p) if p == p else 12,
                )
                for x, y, p in zip(lon, lat, prec)
            ]
        )

    @pandas_udf("struct<longitude: double, latitude: double>")
    def _geohash_decode(s: pd.Series) -> pd.DataFrame:
        pairs = [_geohash_decode_one(x or "") for x in s]
        return pd.DataFrame(
            {"longitude": [p[0] for p in pairs], "latitude": [p[1] for p in pairs]}
        )

    def _norm(form: str):
        @pandas_udf("string")
        def f(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: unicodedata.normalize(form, x) if x is not None else None
            )

        return f

    @pandas_udf("double")
    def _lgamma(x: pd.Series) -> pd.Series:
        import math

        def one(v):
            if v is None or v != v:
                return None
            try:
                return math.lgamma(v)
            except (ValueError, OverflowError):
                # poles (0, negative integers): CH returns +inf
                return float("inf")

        return x.map(one)

    @pandas_udf("double")
    def _tgamma(x: pd.Series) -> pd.Series:
        import math

        def one(v):
            if v is None or v != v:
                return None
            try:
                return math.gamma(v)
            except ValueError:
                # poles: CH yields inf at 0 and nan at negative integers
                return float("inf") if v == 0 else float("nan")
            except OverflowError:
                return float("inf")

        return x.map(one)

    @pandas_udf("double")
    def _jaro_sim(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_jaro(x or "", y or "") for x, y in zip(a, b)])

    @pandas_udf("double")
    def _jw_sim(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_jaro_winkler(x or "", y or "") for x, y in zip(a, b)])

    spark.udf.register("chGeohashEncode", _geohash_encode)
    spark.udf.register("geohashDecode", _geohash_decode)
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        spark.udf.register(f"normalizeUTF8{form}", _norm(form))
    spark.udf.register("chLgamma", _lgamma)
    spark.udf.register("chTgamma", _tgamma)
    spark.udf.register("jaroSimilarity", _jaro_sim)
    spark.udf.register("jaroWinklerSimilarity", _jw_sim)

    # filesystem introspection (CH reports the data-path volume; the
    # driver's working volume is the analog) — evaluated per call on
    # the driver-side plan, constant within a query
    import shutil

    spark.udf.register(
        "filesystemAvailable", lambda: shutil.disk_usage("/").free, "long"
    )
    spark.udf.register(
        "filesystemCapacity", lambda: shutil.disk_usage("/").total, "long"
    )
    spark.udf.register(
        "filesystemUnreserved", lambda: shutil.disk_usage("/").free, "long"
    )
