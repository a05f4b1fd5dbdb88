"""Multimodal column plumbing (north-star extension).

Images/audio/video ride as opaque `binary` columns with a typed
metadata struct. The *Spark-side* machinery — schema, Arrow-batched
`mapInPandas`, partition sizing — is real and tested; the actual codec
work is stubbed (no image/audio libraries in this container) behind
either `NotImplementedError` or a deterministic fake, clearly marked.

Scale design: media bytes never pass through Python row-at-a-time —
`mapInPandas` streams Arrow record batches; partition counts follow
bytes (spark.sql.files.maxPartitionBytes), not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
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

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(content: bytes):  # pragma: no cover - stub
    """STUB: real decode needs an imaging library (not in container).

    The Spark plumbing calls this only when `fake=False`."""
    raise NotImplementedError(
        "image decode requires an imaging library; container ships none — "
        "wire Pillow/torchvision here in production"
    )


def _fake_features(buf: bytes | bytearray | None) -> list[float]:
    """Deterministic stand-in for a feature extractor: bytes → R^16.

    Hash-free folding keeps it reproducible across runs/engines."""
    if not buf:
        return [0.0] * FEATURE_DIM
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(buf):
        acc[i % FEATURE_DIM] = (acc[i % FEATURE_DIM] + b * (1 + i % 7)) % 1000003
    return [a / 1000003.0 for a in acc]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    output schema is fixed so Catalyst can plan downstream joins."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:  # pragma: no cover - needs codec libs
                feats = [decode_image(c) for c in pdf["content"]]
            else:
                feats = [_fake_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB pipeline stage: passthrough plumbing with target size in
    metadata; swap `_fake_resize` for a real codec in production."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # real implementation decodes + resizes; fake keeps bytes
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA).withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB: video frame sampling — emits one row per sampled offset
    with frame content deferred to a real decoder."""
    offsets = F.sequence(
        F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(offsets).alias("offset_ms"),
        F.lit(None).cast("binary").alias("frame"),
    )


def synthetic_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests (no external files)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 31 + j * 7) % 256 for j in range(128 + i))
        rows.append((i, kind, payload, ("application/octet-stream", 8, 8, 4000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
