"""Multimodal column plumbing (SURVEY §7 G).

Images/audio/video are opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, Arrow-batched
pandas UDFs over ``mapInPandas``, partition discipline — is real
and tested; the actual codec step is STUBBED (this container has no
image/audio libraries) behind ``_decode_stub``, which produces a
deterministic fake so tests can assert shapes end-to-end. Swap
``_decode_stub`` for a PIL/ffmpeg call in a real deployment; the
Spark plan does not change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake feature vector (8 floats from byte stats).

    REAL DEPLOYMENT: replace with PIL.Image.open / torchaudio /
    ffmpeg frame sampling. Raising NotImplementedError here would be
    correct too; a deterministic fake keeps the pipeline testable.
    """
    if payload is None:
        return []
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    s = sum(payload)
    return [
        float(n),
        float(s % 251),
        float(payload[0]),
        float(payload[-1]),
        float(max(payload)),
        float(min(payload)),
        float(s / n),
        1.0 if kind == "image" else 0.0,
    ]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """binary payload → fixed-width feature vector via mapInPandas.

    Arrow-batched: each Python invocation sees a pandas frame, never
    a row. Partitioning is preserved (narrow), so upstream layout
    (e.g. bucketing by media_id) survives for later joins.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": [
                        _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 37 + j * 11) % 256) for j in range(64 + (i % 5) * 16))
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                payload,
                ("application/octet-stream", 64, 48, 1000 if kind != "image" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
