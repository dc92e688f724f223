"""Perceptual image hashing (pHash) + near-duplicate image pairing.

The image-side analogue of the text dedup family: a 64-bit DCT-based
perceptual hash per image (robust to re-encoding, format conversion, and
mild quality changes), then hamming-bucketed candidate pairing with the
same 4-chunk pigeonhole design as ``dedup.simhash_buckets`` — images
within hamming distance 3 share at least one 16-bit chunk, so candidates
come from an equi-join, never a cross join.

pHash recipe (public, standard): luminance → 32×32 box-mean resample
(integral image) → 2-D DCT-II → keep the low-frequency 8×8 corner →
bit b = coefficient > median.  Decode+hash runs inside one mapInPandas
stage; the pairing is pure DataFrame ops on 64-bit longs.

Stability caveat (inherent to pHash): images whose low-frequency
spectrum is nearly empty (flat/ultra-smooth synthetic content) leave
many coefficients at the median, where the bit is sign-of-noise; real
photographs and document scans have textured spectra and re-encode to
hamming 0–4.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_N = 32
_D32 = np.zeros((_N, _N))
for _k in range(_N):
    for _n in range(_N):
        _D32[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / (2 * _N)) * (
            np.sqrt(1.0 / _N) if _k == 0 else np.sqrt(2.0 / _N)
        )


def _resize32(lum: np.ndarray) -> np.ndarray:
    """Box-mean resample to 32×32 via an integral image (exact block
    averages, no interpolation kernel to disagree about)."""
    h, w = lum.shape
    if h < _N or w < _N:  # upscale tiny images so every bin is non-empty
        lum = np.repeat(
            np.repeat(lum, -(-_N // h), axis=0), -(-_N // w), axis=1
        )
        h, w = lum.shape
    ye = (np.arange(_N + 1) * h) // _N
    xe = (np.arange(_N + 1) * w) // _N
    c = np.zeros((h + 1, w + 1))
    c[1:, 1:] = lum.cumsum(0).cumsum(1)
    s = (
        c[ye[1:], :][:, xe[1:]]
        - c[ye[:-1], :][:, xe[1:]]
        - c[ye[1:], :][:, xe[:-1]]
        + c[ye[:-1], :][:, xe[:-1]]
    )
    areas = (ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :]
    return s / areas


def phash64(arr: np.ndarray) -> int:
    """uint8 (h, w, 3) image → 64-bit perceptual hash (python int,
    signed-long range for Spark)."""
    lum = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    )
    small = _resize32(lum)
    coefs = _D32 @ small @ _D32.T
    block = coefs[:8, :8].reshape(-1)
    med = np.median(block)
    bits = block > med
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_phash(
    df: DataFrame, payload_col: str = "payload", key_cols: tuple = ("url",)
) -> DataFrame:
    """Decode + pHash inside one Arrow stage; undecodable payloads emit
    no row (they can't be perceptually compared)."""
    from .multimodal import decode_pixels

    key_fields = [df.schema[c] for c in key_cols]
    schema = StructType(
        list(key_fields) + [StructField("phash", LongType(), True)]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                arr = (
                    decode_pixels(bytes(payload))
                    if payload is not None
                    else None
                )
                if arr is None:
                    continue
                recs.append(
                    tuple(row[c] for c in key_cols) + (phash64(arr),)
                )
            yield pd.DataFrame(
                recs, columns=list(key_cols) + ["phash"]
            )

    return df.mapInPandas(gen, schema=schema)


def phash_near_dup_pairs(
    df: DataFrame,
    hash_col: str = "phash",
    id_col: str = "url",
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate pairing on 16-bit chunks (4-way pigeonhole: hamming ≤ 3
    guarantees a shared chunk), exact hamming verify via bit_count(xor).
    Same scale shape as simhash_buckets: equi-join, MERGE-hinted so the
    exploded sides never broadcast."""
    if max_hamming > 3:
        raise ValueError("4x16-bit pigeonhole guarantees only hamming <= 3")
    chunks = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("ph"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright(F.col(hash_col), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "ph", "c.chunk_idx", "c.chunk")
    a, b = chunks.alias("a").hint("MERGE"), chunks.alias("b").hint("MERGE")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.ph").bitwiseXOR(F.col("b.ph"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
