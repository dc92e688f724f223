"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container; see ``decode_image``) behind a deterministic fake — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
mapInPandas signatures, partitioning.  Swapping the stub for PIL/ffmpeg is
a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType(), True),
        StructField("byte_len", IntegerType(), True),
        StructField("digest", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

try:  # gated optional dependency — not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def media_metadata(payload: Column, media_type: str = "image") -> Column:
    """Typed metadata struct for an opaque binary payload — pure
    expressions (length, md5 digest), no decode."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("int").alias("byte_len"),
        F.md5(payload).alias("digest"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def _fake_decode(payload: bytes):
    """Deterministic stand-in for an image decode: derives a (h, w) and a
    16-bin byte histogram feature from the payload bytes.  Replace with
    PIL.Image.open when available."""
    if payload is None:
        return None, None, None
    h = 1 + (len(payload) % 480)
    w = 1 + ((len(payload) * 7) % 640)
    hist = [0] * 16
    for by in payload[:4096]:
        hist[by >> 4] += 1
    total = max(1, sum(hist))
    return h, w, [v / total for v in hist]


def decode_image(payload: bytes):
    """Decode an image payload → (height, width, feature_vector).

    Real decode requires PIL, which this container lacks; the Spark
    plumbing uses the deterministic fake instead.  With PIL installed this
    raises NotImplementedError until a real feature extractor is chosen —
    the contract (shape of the return) is what the pipeline tests."""
    if HAVE_PIL:
        raise NotImplementedError(
            "real image decode path not wired in this environment"
        )
    return _fake_decode(payload)


IMAGE_FEATURES = StructType(
    [
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "img"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the batch
    shape (Arrow chunks of ~2k rows, one python worker per core) is the
    production layout for decode-heavy stages."""
    passthrough = df.schema.fields
    schema = StructType(list(passthrough) + [StructField(out_col, IMAGE_FEATURES, True)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    continue
                h, w, vec = decode_image(bytes(payload))
                feats.append({"height": h, "width": w, "features": vec})
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(gen, schema=schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames: int = 4,
    out_col: str = "frames",
) -> DataFrame:
    """Deterministic 'frame sampling' plumbing for video-typed payloads:
    splits the byte stream into n_frames equal windows and emits one digest
    per window (stand-in for decoded frames).  Demonstrates the
    one-row→many-frames explode shape."""
    win = F.floor(F.length(F.col(payload_col)) / n_frames)
    frames = F.array(
        *[
            F.md5(
                F.substring(
                    F.col(payload_col), (i * 1000) + 1, 1000
                )
            )
            for i in range(n_frames)
        ]
    )
    return df.withColumn(out_col, frames).withColumn(
        "frame_window_bytes", win.cast("int")
    )
