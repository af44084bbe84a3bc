"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed via ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested; the actual media decoding is stubbed — the sandbox has
no image/audio libraries — behind ``decode_fn`` hooks.  The default
``deterministic_fake_features`` derives a stable feature vector from the
bytes, so downstream operators (dedup, similarity) can be exercised
end-to-end without decoders.

At scale: media rows are wide (MBs per row) — ``mapInPandas`` with a
small ``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps Arrow
batches bounded, and repartitioning by a content-hash bucket spreads
hot shards.
"""

from __future__ import annotations

import zlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 16


def decode_image(content: bytes) -> "np.ndarray":
    """Real decoder hook — no imaging library in this container."""
    raise NotImplementedError(
        "media decoding requires an imaging/audio library not present in "
        "this environment; inject decode_fn=... or use "
        "deterministic_fake_features"
    )


def deterministic_fake_features(content: bytes) -> np.ndarray:
    """Stable stand-in features: crc32-seeded pseudo-random unit vector.
    Same bytes -> same vector, so dedup/similarity tests are meaningful."""
    rng = np.random.default_rng(zlib.crc32(content or b""))
    v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def extract_features(
    media: DataFrame,
    decode_fn: Optional[Callable[[bytes], np.ndarray]] = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media table -> (media_id, kind, n_bytes, feature) via mapInPandas.

    The iterator form streams Arrow batches — a partition of large blobs
    never materializes at once in Python.
    """
    fn = decode_fn or deterministic_fake_features

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if c is None else [float(x) for x in fn(bytes(c))]
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        0 if c is None else len(c) for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(process, FEATURES_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(content),
                ("application/octet-stream", 64, 64, 1000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
