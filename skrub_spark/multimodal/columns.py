"""Multimodal column plumbing (SURVEY.md §2, beyond-reference).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side machinery — schemas, Arrow-batched
``mapInPandas`` over payload batches, partition sizing — is real and
tested; the actual codec calls are STUBBED (no imaging/audio libs in
this container): ``use_stub=True`` (default) produces deterministic
fake outputs derived from payload bytes, ``use_stub=False`` raises
NotImplementedError where the real decoder (PIL/ffmpeg) would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_SCHEMA = StructType(
    [
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _stub_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: seeded by payload digest."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    width: int = 32,
    height: int = 32,
    use_stub: bool = True,
) -> DataFrame:
    """binary payload -> decoded pixel stats row (mapInPandas).

    Output adds: decode_ok boolean, px_mean double, px_std double.
    """
    from pyspark.sql.types import BooleanType, DoubleType

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("decode_ok", BooleanType()),
            StructField("px_mean", DoubleType()),
            StructField("px_std", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                raise NotImplementedError(
                    "real image decode requires an imaging library "
                    "(PIL/opencv) on the executors"
                )
            oks, means, stds = [], [], []
            for payload in pdf[payload_col]:
                px = _stub_pixels(payload, width, height)
                oks.append(payload is not None)
                means.append(float(px.mean()))
                stds.append(float(px.std()))
            pdf = pdf.assign(decode_ok=oks, px_mean=means, px_std=stds)
            yield pdf

    return df.mapInPandas(fn, out_schema)


def resize_images(
    df: DataFrame, payload_col: str = "payload", size: tuple[int, int] = (64, 64),
    use_stub: bool = True,
) -> DataFrame:
    """Resize stub: passes payload through, updates width/height
    metadata (a real implementation re-encodes the payload)."""
    if not use_stub:
        raise NotImplementedError("real resize requires an imaging library")
    return df.withColumn("width", F.lit(size[0])).withColumn(
        "height", F.lit(size[1])
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    n_features: int = 16,
    use_stub: bool = True,
) -> DataFrame:
    """payload -> fixed-size feature vector via mapInPandas (the
    shape a vision-model embedding job takes on Spark)."""
    from pyspark.sql.types import ArrayType, DoubleType

    out_schema = StructType(
        df.schema.fields + [StructField("features", ArrayType(DoubleType()))]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                raise NotImplementedError("real features require a vision model")
            feats = []
            for payload in pdf[payload_col]:
                digest = hashlib.sha256(payload or b"").digest()
                vec = np.frombuffer(digest[: n_features * 2], dtype=np.uint16)[
                    :n_features
                ]
                feats.append([float(x) / 65535.0 for x in vec])
            yield pdf.assign(features=feats)

    return df.mapInPandas(fn, out_schema)


def frame_sample_videos(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    use_stub: bool = True,
) -> DataFrame:
    """video payload -> exploded per-frame rows (frame_idx + fake
    frame payload slice). Real impl: ffmpeg keyframe extraction."""
    if not use_stub:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    frames = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return df.withColumn("frame_idx", F.explode(frames)).withColumn(
        "frame_payload",
        F.sha2(F.concat(F.col(payload_col).cast("string"), F.col("frame_idx").cast("string")), 256),
    )
