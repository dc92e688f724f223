"""GIF codec (sources/gif_mini.py): LZW roundtrips across code-size
bumps and the 4095-reset, interlacing, animation compositing, and the
decode_pixels / sample_video_frames integration."""

import struct

import numpy as np
import pytest

from layout_parser_spark.operators.multimodal import (
    decode_pixels,
    image_dimensions,
    sample_video_frames,
)
from layout_parser_spark.sources.gif_mini import (
    _INTERLACE_PASSES,
    _LzwWriter,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def test_roundtrip_small_exact():
    img = np.zeros((10, 13, 3), np.uint8)
    img[2:5, 3:9] = [255, 0, 0]
    img[7:, :] = [0, 0, 255]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_many_colors_crosses_size_bumps():
    """200-color 100x100 image: the literal LZW stream crosses several
    code-size boundaries and the 4095-entry clear/reset."""
    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, (200, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (100, 100))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlaced_decode():
    """Hand-built interlaced GIF: rows stored in the 8/8/4/2 pass order
    with the interlace flag set must come back in display order."""
    rng = np.random.default_rng(9)
    h, w = 13, 7
    img = rng.integers(0, 4, (h, w), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # 4-entry table
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out += bytes([2])  # min code size
    lz = _LzwWriter(2)
    lz.pixels([int(v) for y in order for v in img[y]])
    stream = lz.finish()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    dec = decode_gif(bytes(out))
    assert np.array_equal(dec, pal[img])


def test_animation_compositing_and_transparency():
    frames = [np.full((8, 9, 3), c, np.uint8) for c in (10, 120, 240)]
    fr, delays = decode_gif_frames(encode_gif(frames, fps=5))
    assert len(fr) == 3 and delays == [0.2, 0.2, 0.2]
    assert all(np.array_equal(a, b) for a, b in zip(fr, frames))


def test_decode_pixels_and_dims_dispatch():
    img = np.zeros((6, 11, 3), np.uint8)
    img[:, 5:] = [9, 9, 9]
    g = encode_gif(img)
    assert image_dimensions(g) == (6, 11)
    assert np.array_equal(decode_pixels(g), img)
    assert decode_gif(b"GIF89a" + b"\x00" * 4) is None  # truncated


def test_sample_video_frames_gif(spark):
    frames = [np.full((8, 9, 3), 20 * i + 5, np.uint8) for i in range(8)]
    gif = encode_gif(frames, fps=4)
    df = spark.createDataFrame(
        [("g1", bytearray(gif))], "url string, payload binary"
    )
    rows = {r.frame_idx: r for r in sample_video_frames(df, n_frames=3).collect()}
    assert sorted(rows) == [0, 4, 7]  # even spacing over 8 frames
    assert rows[0].ts_s == 0.0
    assert rows[4].ts_s == pytest.approx(1.0)  # 4 frames * 0.25s
    assert (rows[7].height, rows[7].width) == (8, 9)
    # frame 7 is solid 145 -> luminance bin 9
    assert rows[7].features[9] == pytest.approx(1.0)
