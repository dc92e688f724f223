"""Audio-typed binary columns: real RIFF/WAVE PCM decode (numpy-only,
public WAV format) plus Arrow-batched feature extraction.

Mirrors the image path in ``multimodal.py``: the decode runs INSIDE the
mapInPandas stage (at 100 TB the payload bytes must never leave the
executor as anything but features), formats beyond PCM WAV return None
so callers can fall back to metadata-only.  The reference has no audio
support — this is part of the LLM-training-pipeline surface the engine
adds on top (same contract as image decode: opaque binary + typed
metadata + batch feature UDFs)."""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


def decode_wav(payload: bytes) -> Optional[Tuple[int, int, np.ndarray]]:
    """RIFF/WAVE bytes → (sample_rate, n_channels, float64 samples in
    [-1, 1], shape (n_frames, n_channels)) or None.

    Handles PCM (format 1: u8 / i16 / i32) and IEEE float (format 3:
    f32) sample formats; walks chunks properly so fmt/data need not be
    adjacent (LIST/INFO chunks in crawled files are common)."""
    if payload is None or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_at = pos + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, body_at)
        elif cid == b"data":
            data = payload[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, channels, rate, _brate, _align, bits = fmt
    if channels < 1 or rate < 1 or bits < 8:
        return None
    data = data[: len(data) - (len(data) % (bits // 8))]  # truncated tail
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        return None
    frames = len(x) // channels
    return rate, channels, x[: frames * channels].reshape(frames, channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """float samples in [-1, 1] (n_frames,) or (n_frames, n_channels) →
    16-bit PCM WAV bytes — the test-suite twin of decode_wav."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


AUDIO_FEATURES = StructType(
    [
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("zero_cross_rate", DoubleType(), True),
    ]
)


def audio_features(payload: bytes) -> Optional[dict]:
    """Decode + the standard quality-filter features (duration, RMS
    loudness, peak, zero-crossing rate on the channel mean) — the audio
    analogue of the text quality scores used for corpus filtering."""
    dec = decode_wav(payload)
    if dec is None:
        return None
    rate, ch, x = dec
    if x.shape[0] == 0:
        return {
            "sample_rate": rate,
            "channels": ch,
            "duration_s": 0.0,
            "rms": 0.0,
            "peak": 0.0,
            "zero_cross_rate": 0.0,
        }
    mono = x.mean(axis=1)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if len(mono) > 1 else 0.0
    return {
        "sample_rate": rate,
        "channels": ch,
        "duration_s": x.shape[0] / rate,
        "rms": float(np.sqrt(np.mean(x * x))),
        "peak": float(np.abs(x).max()),
        "zero_cross_rate": zc,
    }


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", out_col: str = "audio"
) -> DataFrame:
    """mapInPandas feature extraction over WAV binary payloads; same
    Arrow batch shape as the image path (one python worker per core,
    ~2k-row chunks)."""
    passthrough = df.schema.fields
    schema = StructType(list(passthrough) + [StructField(out_col, AUDIO_FEATURES, True)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                feats.append(
                    audio_features(bytes(payload)) if payload is not None else None
                )
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(gen, schema=schema)
