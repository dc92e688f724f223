"""Multimodal binary-column operators: REAL pixel decode (PPM/PGM/BMP,
numpy-only) + distributed crop_image (reference layout_elements.py:443-445
numpy-slice semantics), plus the metadata/feature plumbing."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from layout_parser_spark.operators.multimodal import (
    crop_image_blocks,
    decode_image,
    decode_pixels,
    encode_ppm,
    extract_image_features,
    media_metadata,
)


def _grad(h, w):
    """Deterministic RGB gradient image."""
    y = np.arange(h, dtype=np.uint8)[:, None]
    x = np.arange(w, dtype=np.uint8)[None, :]
    return np.stack(
        [np.broadcast_to(x, (h, w)), np.broadcast_to(y, (h, w)),
         np.broadcast_to((x + y) % 256, (h, w))],
        axis=2,
    ).astype(np.uint8)


def _bmp_bytes(arr):
    """Encode (h, w, 3) as bottom-up 24-bit BI_RGB BMP."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):
        row = arr[r, :, ::-1].tobytes()  # RGB→BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pix = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    return header + info + pix


def test_ppm_roundtrip():
    arr = _grad(17, 23)
    assert np.array_equal(decode_pixels(encode_ppm(arr)), arr)


def test_pgm_decode():
    g = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
    payload = b"P5\n# comment\n4 3\n255\n" + g.tobytes()
    out = decode_pixels(payload)
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], g)


def test_bmp_decode():
    arr = _grad(9, 10)  # odd width exercises row padding
    assert np.array_equal(decode_pixels(_bmp_bytes(arr)), arr)


def test_decode_image_real_histogram():
    arr = np.full((4, 4, 3), 255, dtype=np.uint8)
    h, w, feats = decode_image(encode_ppm(arr))
    assert (h, w) == (4, 4)
    assert feats[15] == 1.0 and sum(feats) == pytest.approx(1.0)


def test_decode_image_falls_back_on_unknown_format():
    h, w, feats = decode_image(b"\x89PNG\r\n\x1a\nnot really")
    assert h is not None and len(feats) == 16  # deterministic fake


def test_crop_image_blocks_distributed(spark):
    arr = _grad(40, 60)
    blocks = [
        {"block_type": "rectangle", "x_1": 5.0, "y_1": 10.0, "x_2": 25.0,
         "y_2": 30.0, "id": 0},
        # quad crops its bounding rectangle (reference :1104-1117)
        {"block_type": "quadrilateral",
         "points": [30.0, 2.0, 50.0, 4.0, 52.0, 20.0, 31.0, 18.0], "id": 1},
        # out-of-canvas coords clamp like numpy slicing on the reference
        {"block_type": "rectangle", "x_1": -5.0, "y_1": 35.0, "x_2": 999.0,
         "y_2": 999.0, "id": 2},
    ]
    from layout_parser_spark.schema import TEXTBLOCK

    rows = [("u1", bytearray(encode_ppm(arr)),
             [{f.name: b.get(f.name) for f in TEXTBLOCK.fields} for b in blocks])]
    from pyspark.sql.types import (ArrayType, BinaryType, StringType,
                                   StructField, StructType)

    df = spark.createDataFrame(
        rows,
        StructType([
            StructField("url", StringType()),
            StructField("payload", BinaryType()),
            StructField("blocks", ArrayType(TEXTBLOCK)),
        ]),
    )
    out = {r.block_id: r for r in crop_image_blocks(df).collect()}
    assert set(out) == {0, 1, 2}
    c0 = decode_pixels(bytes(out[0].crop))
    assert np.array_equal(c0, arr[10:30, 5:25])
    assert (out[0].crop_w, out[0].crop_h) == (20, 20)
    c1 = decode_pixels(bytes(out[1].crop))
    assert np.array_equal(c1, arr[2:20, 30:52])
    c2 = decode_pixels(bytes(out[2].crop))
    assert np.array_equal(c2, arr[35:40, 0:60])


def test_media_metadata_and_features(spark):
    arr = _grad(8, 8)
    df = spark.createDataFrame(
        [("a", bytearray(encode_ppm(arr)))], "k string, payload binary"
    ).withColumn("meta", media_metadata(F.col("payload")))
    feat = extract_image_features(df).collect()[0]
    assert feat.meta.byte_len == len(encode_ppm(arr))
    assert feat.img.height == 8 and feat.img.width == 8
    assert len(feat.img.features) == 16
