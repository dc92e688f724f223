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

from layout_parser_spark.sources.charset import decode_payload

DECODERS = [
    decode_payload,
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


# ---------------------------------------------------------------------------
# targeted hostile-input regressions (round-3 ADVICE hardening)
# ---------------------------------------------------------------------------


def test_bmp_header_bomb_rejected():
    """54-byte 'BM' header claiming w=1, h=2^31-1 must return None fast —
    no multi-billion-row loop, no giant allocation."""
    from layout_parser_spark.operators.multimodal import _decode_bmp

    bomb = (
        b"BM" + b"\x00" * 8 + struct.pack("<I", 54)
        + struct.pack("<I", 40) + struct.pack("<ii", 1, 2**31 - 1)
        + struct.pack("<HH", 1, 24) + struct.pack("<I", 0) + b"\x00" * 20
    )
    assert _decode_bmp(bomb) is None
    assert decode_pixels(bomb) is None
    # non-positive dims rejected too
    neg = bytearray(bomb)
    struct.pack_into("<ii", neg, 18, 0, 4)
    assert _decode_bmp(bytes(neg)) is None


def test_bmp_valid_roundtrip_after_guard():
    """The bounded frombuffer path decodes a real 2x2 24bpp BMP exactly."""
    from layout_parser_spark.operators.multimodal import _decode_bmp

    row0 = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # stored bottom row
    row1 = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"
    hdr = (
        b"BM" + struct.pack("<I", 54 + 16) + b"\x00" * 4
        + struct.pack("<I", 54) + struct.pack("<I", 40)
        + struct.pack("<ii", 2, 2) + struct.pack("<HH", 1, 24)
        + struct.pack("<I", 0) + b"\x00" * 20
    )
    arr = _decode_bmp(hdr + row0 + row1)
    assert arr.shape == (2, 2, 3)
    # bottom-up + BGR→RGB: stored row1 is the top image row
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]


def test_pdf_cyclic_refs_terminate():
    """'1 0 obj 1 0 R endobj' (self-referential indirect object) and a
    page tree whose /Kids points at itself must terminate, not hang."""
    from layout_parser_spark.sources.pdf_mini import MiniPdf, Ref

    cyc = b"%PDF-1.4\n1 0 obj 1 0 R endobj\ntrailer\n"
    assert MiniPdf(cyc).resolve(Ref(1)) is None
    kids = (
        b"%PDF-1.4\n1 0 obj << /Type /Pages /Kids [1 0 R] /Count 1 >> "
        b"endobj\n"
    )
    assert MiniPdf(kids).pages() == []


def test_pdf_malformed_yields_no_rows(spark):
    """A payload that makes the extractor raise drops that document
    (choke point) instead of failing the mapInPandas task."""
    from layout_parser_spark.sources.pdf import load_pdf_pages

    def boom(payload):
        raise TypeError("bad page node")

    df = spark.createDataFrame(
        [("u1", b"%PDF-garbage")], "url string, payload binary"
    )
    assert load_pdf_pages(df, extractor=boom).count() == 0


def test_avi_nested_list_no_recursion_error():
    """Deeply nested LIST chunks must not blow the recursion limit."""
    inner = b""
    for _ in range(20000):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"hdrl" + inner
    avi = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert probe_avi(avi) is None  # parses to no-video, without raising


def test_avi_frame_order_preserved():
    """The iterative walk must keep frame order identical to the
    recursive traversal (depth-first, document order)."""
    img = np.zeros((8, 8, 3), np.uint8)
    img2 = img.copy()
    img2[:] = 200
    avi = encode_avi_mjpeg([img, img2])
    dec = decode_avi_frames(avi)
    assert dec is not None
    fps, frames = dec
    assert len(frames) == 2
    from layout_parser_spark.sources.jpeg_mini import decode_jpeg as dj

    assert dj(frames[0]).mean() < 50 < dj(frames[1]).mean()


def test_gif_many_frames_bounded_memory():
    """Thousands of frame descriptors on a large canvas stop at the
    total-retained-pixels cap instead of OOMing."""
    from layout_parser_spark.sources.gif_mini import (
        _MAX_TOTAL_PIXELS,
        decode_gif_frames,
    )

    w = h = 2048  # 4M px canvas → cap allows 64 frames
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    pal = bytes(6)  # 2-entry global palette
    # minimal 1x1 frame: descriptor + LZW min-code + 1 sub-block
    frame = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + b"\x02" + b"\x02\x44\x01" + b"\x00"
    )
    blob = hdr + pal + frame * 500 + b"\x3b"
    dec = decode_gif_frames(blob)
    assert dec is not None
    frames, _ = dec
    assert 0 < len(frames) * w * h <= _MAX_TOTAL_PIXELS


def test_warc_gzip_bomb_bounded_and_corrupt_skipped(spark, tmp_path):
    """A gzip bomb inflates to at most 1000× its compressed size; a
    corrupt member in one file drops that file, not the job."""
    import gzip

    from layout_parser_spark.sources.warc import (
        _gunzip_members,
        read_warc,
        write_warc_file,
    )

    bomb = gzip.compress(b"\x00" * 50_000_000)
    assert len(_gunzip_members(bomb)) <= 1000 * len(bomb)

    good = write_warc_file(
        [{"url": "http://ok", "date": "2024-01-01T00:00:00Z",
          "html": b"<html>x</html>"}],
        gzip_members=True,
    )
    bad = good[:20] + b"\x00\x00\x00\x00" + good[24:]
    (tmp_path / "good.warc.gz").write_bytes(good)
    (tmp_path / "bad.warc.gz").write_bytes(bad)
    out = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    assert [r.url for r in out] == ["http://ok"]
