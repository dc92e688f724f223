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
    n_chunks: int = 4,
) -> DataFrame:
    """Candidate pairing on (64/n_chunks)-bit chunks — the pigeonhole
    guarantees every pair within hamming ≤ n_chunks−1 shares a chunk —
    then exact hamming verify via bit_count(xor).  Same scale shape as
    simhash_buckets: equi-join, MERGE-hinted so the exploded sides never
    broadcast.

    Radius/scale tradeoff: wider radii need more (smaller) chunks, and
    bucket occupancy grows ~n/2^chunk_bits — 16-bit chunks (radius 3)
    stay sparse at corpus scale, 8-bit chunks (radius 7) are for bounded
    collections or pre-blocked corpora."""
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    bpc = 64 // n_chunks
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"{n_chunks}x{bpc}-bit pigeonhole guarantees only "
            f"hamming <= {n_chunks - 1}"
        )
    chunks = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("ph"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright(F.col(hash_col), bpc * i)
                        .bitwiseAND(F.lit((1 << bpc) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_chunks)
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


def video_phash_summary(frames_hashes) -> Optional[int]:
    """Frame-pHash sequence → one 64-bit video signature: split the
    frames into 4 temporal quarters; for each quarter, majority-vote the
    frame hashes bit-wise and keep the low 16 bits of the result as that
    quarter's chunk.  The signature therefore carries temporal structure
    (a re-ordered video differs) while tolerating frame jitter, and
    pairs through the same 4×16-bit pigeonhole join as image pHash."""
    if not frames_hashes:
        return None
    bits = np.array(
        [
            [(int(h) >> b) & 1 for b in range(64)]
            for h in frames_hashes
        ],
        dtype=np.int64,
    )
    q = max(1, len(bits) // 4)
    out = 0
    for qi in range(4):
        chunk = bits[qi * q : (qi + 1) * q] if qi < 3 else bits[3 * q :]
        if len(chunk) == 0:
            chunk = bits[-1:]
        maj = (chunk.sum(axis=0) * 2 >= len(chunk)).astype(np.int64)
        code = int((maj[:16] * (1 << np.arange(16))).sum())
        out |= code << (16 * qi)
    return out - (1 << 64) if out >= (1 << 63) else out


def video_phash(
    df: DataFrame,
    payload_col: str = "payload",
    key_cols: tuple = ("url",),
    n_frames: int = 8,
) -> DataFrame:
    """MJPEG-AVI / animated-GIF payload → 64-bit video signature built
    from evenly-sampled frame pHashes (decode + hash in one Arrow
    stage).  Near-dup pairing: ``phash_near_dup_pairs(out,
    hash_col="vhash")``."""
    from ..sources.avi_mini import decode_avi_frames
    from ..sources.gif_mini import decode_gif_frames
    from ..sources.jpeg_mini import decode_jpeg
    from pyspark.sql.types import LongType

    key_fields = [df.schema[c] for c in key_cols]
    schema = StructType(
        list(key_fields) + [StructField("vhash", LongType(), True)]
    )

    def frame_pixels(payload):
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            dec = decode_gif_frames(payload)
            return None if dec is None else dec[0]
        dec = decode_avi_frames(payload)
        if dec is None:
            return None
        return [decode_jpeg(j) for j in dec[1]]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                frames = (
                    frame_pixels(bytes(payload))
                    if payload is not None
                    else None
                )
                if not frames:
                    continue
                k = min(n_frames, len(frames))
                idxs = sorted(
                    set(
                        round(i * (len(frames) - 1) / max(1, k - 1))
                        for i in range(k)
                    )
                )
                hashes = [
                    phash64(frames[i])
                    for i in idxs
                    if frames[i] is not None
                ]
                sig = video_phash_summary(hashes)
                if sig is None:
                    continue
                recs.append(tuple(row[c] for c in key_cols) + (sig,))
            yield pd.DataFrame(recs, columns=list(key_cols) + ["vhash"])

    return df.mapInPandas(gen, schema=schema)
