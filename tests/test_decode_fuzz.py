"""Fuzz the binary decoders with untrusted bytes: random garbage,
truncations, and single-bit flips of valid files.  The contract for
crawl payloads is 'never raise' — a decoder either returns a result or
None.  Deterministic seed; found two real escapes when first written
(truncated WAV frombuffer, bit-flipped JPEG referencing an undefined
Huffman table)."""

import struct
import zlib

import numpy as np
import pytest

from layout_parser_spark.operators.audio import (
    audio_features,
    decode_wav,
    encode_wav,
)
from layout_parser_spark.operators.multimodal import (
    decode_pixels,
    encode_ppm,
    image_dimensions,
)
from layout_parser_spark.sources.avi_mini import (
    decode_avi_frames,
    encode_avi_mjpeg,
    probe_avi,
)
from layout_parser_spark.sources.gif_mini import decode_gif, encode_gif
from layout_parser_spark.sources.jpeg_mini import decode_jpeg, encode_jpeg

DECODERS = [
    decode_jpeg,
    decode_avi_frames,
    probe_avi,
    decode_wav,
    audio_features,
    decode_pixels,
    image_dimensions,
    decode_gif,
]


def _png_bytes(arr):
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _chunk(t, d):
    return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))


def _png_palette_bytes():
    pal = bytes(range(48))  # 16 RGB entries
    rows = [bytes([i % 16 for i in range(20)]) for _ in range(9)]
    ihdr = struct.pack(">IIBBBBB", 20, 9, 8, 3, 0, 0, 0)
    idat = zlib.compress(b"".join(b"\x00" + r for r in rows))
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", pal) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _png_adam7_bytes(img):
    from layout_parser_spark.operators.multimodal import _ADAM7

    h, w = img.shape[:2]
    rows = []
    for x0, dx, y0, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        rows.extend(sub[r].tobytes() for r in range(sub.shape[0]))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    idat = zlib.compress(b"".join(b"\x00" + r for r in rows))
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    return rng, {
        "jpeg": encode_jpeg(img),
        "jpeg_prog": encode_jpeg(img, progressive=True),
        "avi": encode_avi_mjpeg([img, img]),
        "wav": encode_wav(np.sin(np.arange(800) / 20.0)),
        "png": _png_bytes(img),
        "png_pal": _png_palette_bytes(),
        "png_adam7": _png_adam7_bytes(img),
        "ppm": encode_ppm(img),
        "gif": encode_gif((img >> 6) << 6),  # 4^3 = 64 colors max
    }


def _assert_no_raise(data):
    for fn in DECODERS:
        fn(bytes(data))  # result may be anything; raising is the failure


def test_fuzz_garbage(corpus):
    rng, _ = corpus
    for _ in range(40):
        n = int(rng.integers(0, 4000))
        _assert_no_raise(rng.integers(0, 256, n, dtype=np.uint8).tobytes())


def test_fuzz_truncations(corpus):
    _, valid = corpus
    for v in valid.values():
        for cut in (0, 3, 11, len(v) // 3, len(v) // 2, len(v) - 7):
            _assert_no_raise(v[:cut])


def test_fuzz_bit_flips(corpus):
    rng, valid = corpus
    for v in valid.values():
        for _ in range(60):
            b = bytearray(v)
            pos = int(rng.integers(0, len(b)))
            b[pos] ^= 1 << int(rng.integers(0, 8))
            _assert_no_raise(b)
