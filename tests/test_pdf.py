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
