"""MJPEG-AVI container codec (sources/avi_mini.py) + real distributed
frame sampling (multimodal.sample_video_frames) + JPEG crop re-encode."""

import numpy as np
import pytest

from layout_parser_spark.operators.multimodal import (
    crop_image_blocks,
    decode_pixels,
    encode_ppm,
    sample_video_frames,
)
from layout_parser_spark.sources.avi_mini import (
    decode_avi_frames,
    encode_avi_mjpeg,
    probe_avi,
)
from layout_parser_spark.sources.jpeg_mini import decode_jpeg


def _ramp_frames(n=10, h=24, w=32):
    """Frame i is solid 20*i+10 — sampled frames identify themselves."""
    return [np.full((h, w, 3), 20 * i + 10, np.uint8) for i in range(n)]


def test_avi_roundtrip_and_probe():
    frames = _ramp_frames()
    avi = encode_avi_mjpeg(frames, fps=5)
    assert probe_avi(avi) == (24, 32, 10, 5.0)
    fps, fr = decode_avi_frames(avi)
    assert fps == 5.0 and len(fr) == 10
    for i in (0, 4, 9):
        arr = decode_jpeg(fr[i])
        assert arr.shape == (24, 32, 3)
        assert abs(float(arr.mean()) - (20 * i + 10)) < 2  # JPEG-lossy


def test_avi_rejects():
    assert decode_avi_frames(b"RIFF\x10\x00\x00\x00WAVEdata") is None
    assert decode_avi_frames(b"\x00" * 64) is None
    assert probe_avi(b"OggS" + b"\x00" * 60) is None


def test_sample_video_frames_stage(spark):
    avi = encode_avi_mjpeg(_ramp_frames(), fps=5)
    df = spark.createDataFrame(
        [("v1", bytearray(avi)), ("bad", bytearray(b"\x00" * 50)), ("nul", None)],
        "url string, payload binary",
    )
    rows = sample_video_frames(df, n_frames=4).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 3, 6, 9]  # even spacing
    by_idx = {r.frame_idx: r for r in rows}
    assert all(r.url == "v1" for r in rows)  # bad/null payloads emit none
    assert by_idx[0].ts_s == 0.0 and by_idx[9].ts_s == pytest.approx(1.8)
    assert (by_idx[3].height, by_idx[3].width) == (24, 32)
    # frame 0 is solid 10 -> all luminance mass in bin 0
    assert by_idx[0].features[0] == pytest.approx(1.0)
    # frame 9 is solid 190 -> bin 11 (190 >> 4)
    assert by_idx[9].features[11] == pytest.approx(1.0)


def test_crop_blocks_jpeg_encode(spark):
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 5:25] = 200
    schema = (
        "url string, payload binary, blocks array<struct<"
        "id int, block_type string, x_1 double, y_1 double, "
        "x_2 double, y_2 double, points array<double>>>"
    )
    df = spark.createDataFrame(
        [("u", bytearray(encode_ppm(img)),
          [(0, "rectangle", 5.0, 10.0, 25.0, 20.0, None)])],
        schema,
    )
    (row,) = crop_image_blocks(df, encode_fmt="jpeg").collect()
    assert (row.crop_w, row.crop_h) == (20, 10)
    arr = decode_pixels(bytes(row.crop))  # magic-dispatches to JPEG
    assert arr.shape == (10, 20, 3)
    assert abs(float(arr.mean()) - 200) < 3
    with pytest.raises(ValueError):
        crop_image_blocks(df, encode_fmt="webp")


def test_image_phash_near_dup_pipeline(spark):
    """pHash end-to-end: same content re-encoded (formats/qualities)
    pairs up within hamming<=3; distinct images do not."""
    from layout_parser_spark.operators.phash import image_phash, phash_near_dup_pairs
    from layout_parser_spark.sources.jpeg_mini import encode_jpeg

    # textured like a real photo: pHash's median-threshold bits are only
    # stable when the low-freq spectrum has real energy (ultra-smooth
    # synthetic ramps leave half the coefficients at sign-of-noise)
    yy, xx = np.mgrid[0:120, 0:160]
    base = (
        np.stack(
            [
                xx * 255 / 160,
                yy * 255 / 120,
                128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            ],
            axis=2,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )
    rng = np.random.default_rng(8)
    other = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    rows = [
        ("a_ppm", bytearray(encode_ppm(base))),
        ("a_jpg", bytearray(encode_jpeg(base, quality=92))),
        ("a_prog", bytearray(encode_jpeg(base, quality=85, progressive=True))),
        ("b_other", bytearray(encode_ppm(other))),
        ("c_bad", bytearray(b"\x00" * 40)),  # undecodable: no row
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    hashed = image_phash(df)
    assert hashed.count() == 4  # c_bad dropped
    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in phash_near_dup_pairs(hashed).collect()
    }
    assert ("a_jpg", "a_ppm") in pairs
    assert ("a_ppm", "a_prog") in pairs or ("a_prog", "a_ppm") in pairs
    assert not any("b_other" in p for p in pairs)


def test_video_phash_near_dup(spark):
    from layout_parser_spark.operators.phash import phash_near_dup_pairs, video_phash
    from layout_parser_spark.sources.avi_mini import encode_avi_mjpeg

    # frames must be photo-sized: tiny frames leave the 32x32 resample
    # under-smoothed and pHash bits unstable (measured: 64x80 frames
    # drift 8-16 bits across qualities, 120x160 drift 0-1)
    yy, xx = np.mgrid[0:120, 0:160]
    def frame(p):  # textured, phase-shifted per frame
        return (
            np.stack(
                [xx * 255 / 160, yy * 255 / 120,
                 128 + 100 * np.sin(xx / 9.0 + p) * np.cos(yy / 7.0)],
                axis=2,
            ).clip(0, 255).astype(np.uint8)
        )

    clip = [frame(p * 0.5) for p in range(8)]
    rows = [
        ("avi_q92", bytearray(encode_avi_mjpeg(clip, fps=5, quality=92))),
        ("avi_q75", bytearray(encode_avi_mjpeg(clip, fps=5, quality=75))),
        ("avi_rev", bytearray(encode_avi_mjpeg(clip[::-1], fps=5, quality=92))),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    sigs = video_phash(df)
    assert sigs.count() == 3
    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in phash_near_dup_pairs(sigs, hash_col="vhash").collect()
    }
    assert ("avi_q75", "avi_q92") in pairs  # same clip, different quality
    # temporal structure: the reversed clip must NOT pair
    assert not any("avi_rev" in p for p in pairs)
