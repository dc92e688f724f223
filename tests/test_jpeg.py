"""Baseline JPEG codec (sources/jpeg_mini.py): roundtrip across
subsampling/quality/restart-interval configs, spec-compliance checks on
real reference-repo JPEGs, and the decode_pixels dispatch.

Encoder and decoder are independent code paths (the decoder reads every
table from the bitstream), so a roundtrip pins the entropy coding, MCU
interleave, and color transform against each other; the reference-repo
fixtures pin the decoder against real libjpeg output structure."""

import numpy as np
import pytest

from layout_parser_spark.operators.multimodal import decode_pixels
from layout_parser_spark.sources.jpeg_mini import (
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
)

REF_JPG = "/root/reference/tests/fixtures/model/test_model_image.jpg"


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                xx * 255 / w,
                yy * 255 / h,
                128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
            ],
            axis=2,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("restart", [0, 3])
def test_roundtrip(sub, restart):
    img = _smooth(45, 61)  # non-multiple-of-8/16 dims exercise edge MCUs
    enc = encode_jpeg(img, quality=90, subsampling=sub, restart_interval=restart)
    dec = decode_jpeg(enc)
    assert dec.shape == (45, 61, 3)
    diff = np.abs(dec.astype(int) - img.astype(int))
    # 4:2:0 loses chroma resolution; luma-dominant bound still tight
    assert diff.mean() < (3.0 if sub == "4:2:0" else 1.5)
    assert diff.max() < (25 if sub == "4:2:0" else 10)
    assert jpeg_dimensions(enc) == (45, 61)


def test_solid_color_exact():
    solid = np.full((8, 8, 3), 200, np.uint8)
    dec = decode_jpeg(encode_jpeg(solid, quality=95))
    assert int(np.abs(dec.astype(int) - 200).max()) == 0


def test_grayscale():
    yy, xx = np.mgrid[0:24, 0:33]
    g = ((xx + yy) * 255 / 57).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (24, 33, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])  # gray replicated
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_quality_monotone_size():
    img = _smooth(40, 40)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 95)]
    assert sizes == sorted(sizes)


def test_reference_fixture_decodes():
    """A real libjpeg-produced file: dims from the SOF header must match
    the decoded array, and a document scan is mostly white with dark
    ink — pins the color transform's polarity and range."""
    data = open(REF_JPG, "rb").read()
    h, w = jpeg_dimensions(data)
    arr = decode_jpeg(data)
    assert arr.shape == (h, w, 3) == (932, 1279, 3)
    assert 200 < arr.mean() < 255  # mostly white page
    assert arr.min() < 100  # has dark text pixels


def test_reject_paths():
    img = _smooth(16, 16)
    enc = encode_jpeg(img)
    assert decode_jpeg(b"\x89PNG\r\n\x1a\n1234") is None  # wrong magic
    assert decode_jpeg(enc[:40]) is None  # truncated header
    # truncated entropy data: best-effort like libjpeg (decode from pad
    # bits) or a clean None — never an exception
    out = decode_jpeg(enc[:-30])
    assert out is None or out.shape == (16, 16, 3)
    arith = enc.replace(b"\xff\xc0", b"\xff\xc9", 1)
    assert decode_jpeg(arith) is None  # arithmetic coding unsupported


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("restart", [0, 3])
def test_progressive_identical_to_baseline(sub, restart):
    """Progressive (SOF2) decode of the same quantized coefficients must
    be PIXEL-IDENTICAL to the fixture-validated baseline decode — this
    cross-checks spectral selection, successive approximation (DC+AC
    first/refine), and EOB-run handling against the sequential path."""
    img = _smooth(45, 61)
    base = decode_jpeg(
        encode_jpeg(img, quality=80, subsampling=sub, restart_interval=restart)
    )
    prog = decode_jpeg(
        encode_jpeg(
            img, quality=80, subsampling=sub,
            restart_interval=restart, progressive=True,
        )
    )
    assert prog is not None
    assert np.array_equal(base, prog)


def test_progressive_noise_and_padded_grids():
    """Noise maximizes ZRL/EOBRUN/refinement traffic; w=50 at 4:2:0 gives
    a luma grid wider than the component's own block count (padded MCU
    columns are AC-skipped in progressive scans but cropped away)."""
    rng = np.random.default_rng(11)
    for h, w in [(50, 50), (17, 50), (9, 24)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        b = decode_jpeg(encode_jpeg(img, quality=80, subsampling="4:2:0"))
        p = decode_jpeg(
            encode_jpeg(img, quality=80, subsampling="4:2:0", progressive=True)
        )
        assert np.array_equal(b, p)


def test_progressive_grayscale_and_dims():
    yy, xx = np.mgrid[0:24, 0:33]
    g = ((xx + yy) * 255 / 57).astype(np.uint8)
    enc = encode_jpeg(g, quality=90, progressive=True)
    assert jpeg_dimensions(enc) == (24, 33)  # SOFn scan covers SOF2
    assert np.array_equal(decode_jpeg(enc), decode_jpeg(encode_jpeg(g, quality=90)))


def test_decode_pixels_dispatch():
    img = _smooth(20, 28)
    arr = decode_pixels(encode_jpeg(img, quality=95))
    assert arr.shape == (20, 28, 3)
    assert np.abs(arr.astype(int) - img.astype(int)).mean() < 1.5


def test_every_reference_repo_image_decodes():
    """Sweep ALL images shipped in the reference repo (real libpng/
    libjpeg output, assorted encoders/filters/subsampling): header dims
    must parse, pixels must decode, and the two must agree."""
    import glob

    paths = sorted(
        glob.glob("/root/reference/**/*.png", recursive=True)
        + glob.glob("/root/reference/**/*.jpg", recursive=True)
        + glob.glob("/root/reference/**/*.jpeg", recursive=True)
    )
    assert len(paths) >= 19  # the sweep is real, not an empty glob
    from layout_parser_spark.operators.multimodal import (
        decode_pixels,
        image_dimensions,
    )

    for p in paths:
        data = open(p, "rb").read()
        dims = image_dimensions(data)
        arr = decode_pixels(data)
        assert arr is not None and dims is not None, p
        assert arr.shape == (dims[0], dims[1], 3), p
