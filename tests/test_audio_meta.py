"""Audio decode/features (operators/audio.py) and header-only image
dimensions + decoded media metadata (operators/multimodal.py)."""

import struct

import numpy as np
import pytest

from layout_parser_spark.operators.audio import (
    audio_features,
    decode_wav,
    encode_wav,
    extract_audio_features,
)
from layout_parser_spark.operators.multimodal import (
    encode_ppm,
    image_dimensions,
    media_metadata_decoded,
)
from layout_parser_spark.sources.jpeg_mini import encode_jpeg

RATE = 16000


def _sine(freq=440.0, secs=0.5, amp=0.5):
    t = np.arange(int(RATE * secs)) / RATE
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_mono():
    x = _sine()
    rate, ch, out = decode_wav(encode_wav(x, RATE))
    assert (rate, ch) == (RATE, 1)
    assert out.shape == (len(x), 1)
    assert np.abs(out[:, 0] - x).max() < 2e-4  # 16-bit quantization


def test_wav_roundtrip_stereo_and_features():
    x = np.stack([_sine(440), _sine(880)], axis=1)
    payload = encode_wav(x, RATE)
    f = audio_features(payload)
    assert f["channels"] == 2
    assert abs(f["duration_s"] - 0.5) < 1e-9
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 0.5) < 1e-3
    # sin(a)+sin(2a) = sin(a)(1+2cos(a)): 4 zero crossings per 440 Hz
    # period (2 from sin(a), 2 from cos(a) = -1/2)
    assert abs(f["zero_cross_rate"] - 4 * 440 / RATE) < 0.01


def test_wav_8bit_f32_and_chunk_walk():
    x = _sine(secs=0.01)
    # u8 PCM
    u8 = ((np.clip(x, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
    hdr = struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 36 + len(u8)) + b"WAVEfmt " + hdr
        + b"data" + struct.pack("<I", len(u8)) + u8
    )
    rate, ch, out = decode_wav(wav8)
    assert np.abs(out[:, 0] - x).max() < 0.02  # 8-bit quantization
    # f32 + a LIST chunk between fmt and data (odd size → word padding)
    f32 = x.astype("<f4").tobytes()
    hdr = struct.pack("<IHHIIHH", 16, 3, 1, RATE, RATE * 4, 4, 32)
    wavf = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVEfmt " + hdr
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + b"data" + struct.pack("<I", len(f32)) + f32
    )
    rate, ch, out = decode_wav(wavf)
    assert np.abs(out[:, 0] - x).max() < 1e-6


def test_wav_rejects():
    assert decode_wav(b"OggS" + b"\x00" * 60) is None
    x = encode_wav(_sine(secs=0.01))
    mp3ish = x[:20] + struct.pack("<H", 85) + x[22:]  # fmt code 85 = MP3
    assert decode_wav(mp3ish) is None


def test_image_dimensions_all_formats():
    arr = np.zeros((7, 11, 3), np.uint8)
    assert image_dimensions(encode_ppm(arr)) == (7, 11)
    assert image_dimensions(encode_jpeg(arr)) == (7, 11)
    png = open("/root/reference/.github/example.png", "rb").read()
    jpg = open(
        "/root/reference/tests/fixtures/model/test_model_image.jpg", "rb"
    ).read()
    assert image_dimensions(png) == (1059, 2908)
    assert image_dimensions(jpg) == (932, 1279)
    assert image_dimensions(b"GIF89a" + b"\x00" * 20) is None
    assert image_dimensions(None) is None


def test_media_metadata_decoded_and_audio_stage(spark):
    ppm = encode_ppm(np.zeros((5, 9, 3), np.uint8))
    jpg = encode_jpeg(np.zeros((6, 4, 3), np.uint8))
    wav = encode_wav(_sine(secs=0.02))
    df = spark.createDataFrame(
        [("a", bytearray(ppm)), ("b", bytearray(jpg)), ("c", bytearray(wav)), ("d", None)],
        "id string, payload binary",
    )
    rows = {r.id: r.meta for r in media_metadata_decoded(df).collect()}
    assert (rows["a"].height, rows["a"].width) == (5, 9)
    assert (rows["b"].height, rows["b"].width) == (6, 4)
    assert rows["c"].media_type == "audio" and rows["c"].width is None
    assert rows["d"] is None

    arows = {r.id: r.audio for r in extract_audio_features(df).collect()}
    assert arows["a"] is None  # not a WAV
    assert arows["c"].sample_rate == RATE
    assert abs(arows["c"].duration_s - 0.02) < 1e-9
    assert arows["d"] is None


def test_media_metadata_classifies_video(spark):
    from layout_parser_spark.sources.avi_mini import encode_avi_mjpeg

    avi = encode_avi_mjpeg([np.zeros((6, 8, 3), np.uint8)] * 2, fps=4)
    df = spark.createDataFrame(
        [("v", bytearray(avi))], "id string, payload binary"
    )
    (row,) = media_metadata_decoded(df).collect()
    assert row.meta.media_type == "video"
    assert (row.meta.height, row.meta.width) == (6, 8)


def _melody(notes, dur=0.25):
    out = []
    for f in notes:
        t = np.arange(int(RATE * dur)) / RATE
        env = np.minimum(1, 10 * t) * np.exp(-3 * t)
        out.append(
            0.6 * env * np.sin(2 * np.pi * f * t)
            + 0.25 * env * np.sin(2 * np.pi * 2 * f * t)
        )
    return np.concatenate(out)


def test_audio_fingerprint_invariances():
    from layout_parser_spark.operators.audio import audio_fingerprint

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    tune = _melody([440, 494, 523, 587, 659, 587, 523, 494])
    codes, s = audio_fingerprint(encode_wav(tune, RATE))
    assert len(codes) > 20 and all(0 <= c < (1 << 15) for c in codes)
    _, s_gain = audio_fingerprint(encode_wav(tune * 0.4, RATE))
    assert ham(s, s_gain) <= 3  # gain invariance
    _, s_same = audio_fingerprint(encode_wav(tune, RATE))
    assert s_same == s  # deterministic
    _, s_other = audio_fingerprint(
        encode_wav(_melody([330, 349, 392, 440, 392, 349, 330, 294]), RATE)
    )
    assert ham(s, s_other) > 10  # different melody separates
    assert audio_fingerprint(encode_wav(tune[:1000], RATE)) is None  # short


def test_audio_fingerprint_pairing(spark):
    from layout_parser_spark.operators.audio import extract_audio_fingerprints
    from layout_parser_spark.operators.phash import phash_near_dup_pairs

    tune = _melody([440, 494, 523, 587, 659, 587, 523, 494])
    other = _melody([330, 349, 392, 440, 392, 349, 330, 294])
    df = spark.createDataFrame(
        [
            ("t_orig", bytearray(encode_wav(tune, RATE))),
            ("t_gain", bytearray(encode_wav(tune * 0.5, RATE))),
            ("o_other", bytearray(encode_wav(other, RATE))),
            ("bad", bytearray(b"\x00" * 50)),
        ],
        "url string, payload binary",
    )
    fps = extract_audio_fingerprints(df)
    assert fps.count() == 3  # bad dropped
    pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in phash_near_dup_pairs(fps, hash_col="afp").collect()
    }
    assert ("t_gain", "t_orig") in pairs
    assert not any("o_other" in p for p in pairs)


def test_audio_sequence_pairs_ber(spark):
    """Heavy-transcode acceptance: pair A/B share the summary hash but
    differ in a few frame-code bits (low BER, accepted); C's codes are
    inverted (BER ~1, rejected even though pigeonholed)."""
    from layout_parser_spark.operators.audio import audio_sequence_pairs

    base = [0x0F0F0F0F, 0x12345678, 0x0000FFFF, 0x55555555] * 4
    flip2 = list(base)
    flip2[0] ^= 0b11  # 2 bits over 16 frames*32 bits → BER ~0.004
    def s32(v):  # codes are signed int32 columns
        return v - (1 << 32) if v >= (1 << 31) else v

    inv = [s32(c ^ 0xFFFFFFFF) for c in base]
    df = spark.createDataFrame(
        [("A", 7, base), ("B", 7, flip2), ("C", 7, inv)],
        "url string, afp long, codes array<int>",
    )
    out = {(r.id_a, r.id_b): (r.ber, r.n_frames)
           for r in audio_sequence_pairs(df, max_ber=0.25).collect()}
    assert set(out) == {("A", "B")}
    ber, n = out[("A", "B")]
    assert n == 16 and 0 < ber < 0.01
