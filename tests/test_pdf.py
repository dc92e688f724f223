"""PDF token source vs the reference's own fixtures (tests/test_io.py:72-90):
example.pdf → 1 page, tokens present, exactly 3 font types; empty.pdf →
1 page, 0 tokens.  Runs through the full distributed path
(binary payload column → mapInPandas → per-page blocks)."""

import pytest
from pyspark.sql import functions as F

from layout_parser_spark.sources.pdf import extract_pdf_pages, load_pdf_pages
from layout_parser_spark.sources.pdf_mini import extract_pdf_words

EXAMPLE = "/root/reference/tests/fixtures/io/example.pdf"
EMPTY = "/root/reference/tests/fixtures/io/empty.pdf"


def test_example_pdf_reference_assertions():
    """Mirror of reference test_pdf (tests/test_io.py:72-81)."""
    with open(EXAMPLE, "rb") as f:
        pages = extract_pdf_pages(f.read())
    assert len(pages) == 1
    idx, w, h, blocks = pages[0]
    assert (idx, w, h) == (0, 612.0, 792.0)
    assert len(blocks) > 0
    # only three types of font show up in the file
    assert len(set(b["type"] for b in blocks)) == 3
    # tokens carry real text and sane in-page boxes
    texts = [b["text"] for b in blocks]
    assert texts[:3] == ["Test", "PDF", "File"]
    for b in blocks:
        assert 0 <= b["x_1"] <= b["x_2"] <= w
        assert 0 <= b["y_1"] <= b["y_2"] <= h
    # id = positional index (reference load_dataframe 'index' → id)
    assert [b["id"] for b in blocks] == list(range(len(blocks)))


def test_empty_pdf_reference_assertions():
    """Mirror of reference test_empty_pdf (tests/test_io.py:83-90)."""
    with open(EMPTY, "rb") as f:
        pages = extract_pdf_pages(f.read())
    assert len(pages) == 1  # only one page
    idx, w, h, blocks = pages[0]
    assert blocks == []  # no selectable tokens on the page


def test_load_pdf_pages_distributed(spark):
    """Full Spark path over a 2-document binary column."""
    with open(EXAMPLE, "rb") as f:
        example = f.read()
    with open(EMPTY, "rb") as f:
        empty = f.read()
    df = spark.createDataFrame(
        [("doc://example", bytearray(example)), ("doc://empty", bytearray(empty))],
        "url string, payload binary",
    )
    out = {r.url: r for r in load_pdf_pages(df).collect()}
    assert len(out) == 2
    ex = out["doc://example"]
    assert ex.page_data.width == 612.0 and ex.page_data["index"] == 0
    assert len(ex.blocks) > 0
    assert len(set(b.type for b in ex.blocks)) == 3
    assert out["doc://empty"].blocks == []


def test_mini_extractor_word_geometry():
    """Word boxes are monotone along each line and words on one line share
    the baseline band."""
    with open(EXAMPLE, "rb") as f:
        pages = extract_pdf_words(f.read())
    _, w, h, words = pages[0]
    assert 100 < len(words) < 400
    by_top = {}
    for wd in words:
        by_top.setdefault(round(wd["top"]), []).append(wd)
    multi = [v for v in by_top.values() if len(v) > 2]
    assert multi, "no multi-word lines found"
    for line in multi:
        xs = [wd["x0"] for wd in line]
        assert xs == sorted(xs)  # stream order is left-to-right here


def test_pdf_lexer_object_forms():
    """The mini-PDF object lexer handles the spec's literal forms:
    escapes, octal, nested parens, hex strings, name #-escapes, refs,
    dicts/arrays, comments."""
    from layout_parser_spark.sources.pdf_mini import Name, Ref, _Lexer

    def parse(b):
        return _Lexer(b).parse()

    assert parse(rb"(simple)") == b"simple"
    assert parse(rb"(a\(b\)c)") == b"a(b)c"
    assert parse(rb"(nested (parens) ok)") == b"nested (parens) ok"
    assert parse(rb"(tab\there)") == b"tab\there"
    assert parse(rb"(octal \101\102\103)") == b"octal ABC"
    assert parse(b"(line\\\ncontinues)") == b"linecontinues"
    assert parse(rb"<48656C6C6F>") == b"Hello"
    assert parse(rb"<48656C6C6F7>") == b"Hellop"  # odd hex pads with 0
    assert parse(rb"/Name#20With#20Spaces") == "Name With Spaces"
    assert isinstance(parse(rb"/Type"), Name)
    r = parse(rb"12 0 R")
    assert isinstance(r, Ref) and r.num == 12
    assert parse(rb"12") == 12 and parse(rb"-3.5") == -3.5
    assert parse(rb"true") is True and parse(rb"null") is None
    d = parse(rb"<< /A 1 /B [2 3 0 R (s)] /C << /D true >> >>")
    assert d["A"] == 1 and d["C"]["D"] is True
    assert d["B"][0] == 2 and isinstance(d["B"][1], Ref)
    assert parse(b"% comment\n42") == 42


def test_pdf_extractor_tolerates_garbage():
    """Garbage or truncated payloads yield empty page lists / no tokens,
    never exceptions (the distributed path must not fail a whole task)."""
    from layout_parser_spark.sources.pdf_mini import extract_pdf_words

    assert extract_pdf_words(b"not a pdf at all") == []
    assert extract_pdf_words(b"%PDF-1.3\njunk") == []
    # a valid header with one malformed object: page tree absent → []
    assert extract_pdf_words(b"%PDF-1.3\n1 0 obj\n<< /Broken\nendobj") == []


# ---------------------------------------------------------------------------
# load_pdf(load_images=True) render + rescale branch (io/pdf.py:205-224)
# ---------------------------------------------------------------------------


def _pages_with_images(spark, dpi):
    from layout_parser_spark.sources.pdf import load_pdf_pages_with_images

    ex = open(
        "/root/reference/tests/fixtures/io/example.pdf", "rb"
    ).read()
    df = spark.createDataFrame(
        [("u", bytearray(ex))], "url string, payload binary"
    )
    return load_pdf_pages_with_images(df, dpi=dpi).collect()


def test_load_images_same_dpi_no_rescale(spark):
    """dpi=72 → raster dims equal PDF point dims (example.pdf has
    integer point dims) → layout passes through untouched."""
    from layout_parser_spark.sources.pdf import load_pdf_pages

    ex = open("/root/reference/tests/fixtures/io/example.pdf", "rb").read()
    df = spark.createDataFrame(
        [("u", bytearray(ex))], "url string, payload binary"
    )
    plain = load_pdf_pages(df).collect()
    rows = _pages_with_images(spark, dpi=72)
    assert len(rows) == len(plain) == 1
    r, p = rows[0], plain[0]
    assert (r.image_w, r.image_h) == (
        round(p.page_data.width), round(p.page_data.height)
    )
    assert r.page_data == p.page_data
    assert [
        (b.x_1, b.y_1, b.x_2, b.y_2) for b in r.blocks
    ] == [(b.x_1, b.y_1, b.x_2, b.y_2) for b in p.blocks]
    assert r.image is not None and bytes(r.image[:2]) == b"P6"


def test_load_images_rescale_to_image_dims(spark):
    """dpi=144 → image dims are 2× the layout dims → every block scales
    by exactly (2, 2) and page_data takes the image dims — the reference
    branch on a fixture with layout-dims ≠ image-dims."""
    from layout_parser_spark.sources.pdf import load_pdf_pages

    ex = open("/root/reference/tests/fixtures/io/example.pdf", "rb").read()
    df = spark.createDataFrame(
        [("u", bytearray(ex))], "url string, payload binary"
    )
    plain = load_pdf_pages(df).collect()[0]
    r = _pages_with_images(spark, dpi=144)[0]
    sx = r.image_w / plain.page_data.width
    sy = r.image_h / plain.page_data.height
    assert (sx, sy) == (2.0, 2.0)
    assert r.page_data.width == float(r.image_w)
    assert r.page_data.height == float(r.image_h)
    assert r.page_data["index"] == plain.page_data["index"]
    got = [(b.x_1, b.y_1, b.x_2, b.y_2) for b in r.blocks]
    want = [
        (b.x_1 * 2.0, b.y_1 * 2.0, b.x_2 * 2.0, b.y_2 * 2.0)
        for b in plain.blocks
    ]
    assert got == want
    # metadata survives the rescale
    assert [(b.text, b.id, b.type) for b in r.blocks] == [
        (b.text, b.id, b.type) for b in plain.blocks
    ]


def test_load_images_render_failure_keeps_tokens(spark):
    """A renderer that raises yields NULL image and an unscaled layout —
    token extraction must not be hostage to rasterization."""
    from layout_parser_spark.sources.pdf import load_pdf_pages_with_images

    def boom(payload, idx, w, h, dpi):
        raise RuntimeError("no poppler")

    ex = open("/root/reference/tests/fixtures/io/example.pdf", "rb").read()
    df = spark.createDataFrame(
        [("u", bytearray(ex))], "url string, payload binary"
    )
    rows = load_pdf_pages_with_images(df, renderer=boom).collect()
    assert len(rows) == 1
    assert rows[0].image is None and rows[0].image_w is None
    assert len(rows[0].blocks) == 143
