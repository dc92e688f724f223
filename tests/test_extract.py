"""North-rule gate: byte-identical extracted text per url.

Three-way agreement on the sf0.001 documents corpus:
engine (Spark pipeline) == independent oracle (reference-style scalar
implementation) == the original document text (the synthetic page embeds
the document's own tokens as main content)."""

import os

import pytest
from pyspark.sql import functions as F

from layout_parser_spark.plans import extract_main_text, xy_cut_indices
from layout_parser_spark.plans.segment import parse_page
from layout_parser_spark.sources import render_page_html, synth_pages
from oracle_extract import oracle_extract

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_oracle_vs_renderer_roundtrip():
    """Pure-python sanity: oracle on a rendered page returns the original
    text (no Spark)."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    for doc_id in (0, 1, 7, 42, 123456):
        html = render_page_html(doc_id, text)
        assert oracle_extract(html) == text, doc_id


def test_segmentation_parses_blocks():
    html = render_page_html(3, "one two three four five six seven eight "
                               "nine ten eleven twelve")
    w, h, rows = parse_page(html)
    assert w == 1280 and h >= 1000
    types = [r["type"] for r in rows]
    assert "Header" in types and "Footer" in types and "Nav" in types
    assert "Figure" in types
    # caption block has parent set to the figure block id
    fig_id = next(r["id"] for r in rows if r["type"] == "Figure")
    caption = [r for r in rows if r["parent"] == fig_id]
    assert len(caption) == 1
    # ad block: all-anchor text → score 0
    ad = [r for r in rows if r["score"] is not None and r["score"] < 0.5]
    assert len(ad) >= 2  # nav + ad


def test_xy_cut_two_columns():
    # two columns, two blocks each; xy-cut must read left column first
    import numpy as np

    x1 = np.array([240.0, 240.0, 760.0, 760.0])
    y1 = np.array([120.0, 300.0, 120.0, 300.0])
    x2 = np.array([740.0, 740.0, 1260.0, 1260.0])
    y2 = np.array([260.0, 420.0, 260.0, 420.0])
    assert xy_cut_indices(x1, y1, x2, y2) == [0, 1, 2, 3]
    # interleave input order; permutation must still read columns
    perm = [2, 0, 3, 1]  # block i of the above placed at position perm[i]
    xx1 = x1[perm]
    assert xy_cut_indices(xx1, y1[perm], x2[perm], y2[perm]) == [1, 3, 0, 2]


def test_extract_byte_identical(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = synth_pages(docs)
    out = extract_main_text(pages).select(
        "doc_id", "text", "extracted_text", "n_blocks"
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    mismatches = [
        (r.doc_id, r.text, r.extracted_text)
        for r in rows
        if r.extracted_text != r.text
    ]
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[:2]}"
    assert all(r.n_blocks >= 1 for r in rows)


def test_engine_matches_independent_oracle(spark):
    """Engine vs oracle on the html itself (not just vs original text)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    pages = synth_pages(docs).select("doc_id", "url", "html")
    engine = {
        r.doc_id: r.extracted_text
        for r in extract_main_text(pages).select(
            "doc_id", "extracted_text"
        ).collect()
    }
    local = pages.select("doc_id", "html").collect()
    for r in local:
        expected = oracle_extract(bytes(r.html).decode("utf-8"))
        assert engine[r.doc_id] == expected, r.doc_id


def test_specialized_fig_predicate_equals_is_in(ev):
    """extract.keep_main_block's rect×rect center test must equal the
    general is_in(center=True) predicate on rectangles."""
    from layout_parser_spark import schema as S
    from layout_parser_spark.functions import is_in

    cases = [
        ((240, 500, 740, 660), (240, 500, 740, 660)),  # self
        ((260, 620, 720, 650), (240, 500, 740, 660)),  # caption in figure
        ((0, 0, 10, 10), (240, 500, 740, 660)),        # far outside
        ((230, 490, 250, 510), (240, 500, 740, 660)),  # center on edge
    ]
    exprs = []
    for i, (bb, ff) in enumerate(cases):
        b = S.rectangle(*map(float, bb))
        f = S.rectangle(*map(float, ff))
        general = is_in(b, f, center=True)
        cx = (b["x_1"] + b["x_2"]) / 2.0
        cy = (b["y_1"] + b["y_2"]) / 2.0
        special = (
            (f["x_1"] <= cx) & (cx <= f["x_2"])
            & (f["y_1"] <= cy) & (cy <= f["y_2"])
        )
        exprs.append(general.alias(f"g{i}"))
        exprs.append(special.alias(f"s{i}"))
    row = ev(*exprs)
    d = row.asDict()
    for i in range(len(cases)):
        assert d[f"g{i}"] == d[f"s{i}"], (i, d)


def test_columnar_reading_order_equivalent(spark):
    """The pure-expression 2-column recipe must agree with the XY-cut UDF
    on the synthetic (≤2-column) corpus — both byte-identical to source."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    pages = synth_pages(docs)
    out = extract_main_text(pages, reading_order="columnar").select(
        "doc_id", "text", "extracted_text"
    )
    rows = out.collect()
    assert all(r.extracted_text == r.text for r in rows)


def test_zero_block_page_yields_empty_layout(spark):
    """A page with no data-box elements must produce an EMPTY blocks array
    (reference returns Layout([])), not one phantom all-NULL block."""
    from layout_parser_spark.plans.segment import segment_pages

    pages = spark.createDataFrame(
        [
            (0, '<html data-w="800" data-h="600"><body></body></html>'),
            (1, '<html data-w="800" data-h="600">'
                '<p data-box="10,10,100,30">hello world</p></html>'),
        ],
        "doc_id long, html string",
    )
    rows = {r.doc_id: r for r in segment_pages(pages).collect()}
    assert rows[0].blocks == []
    assert len(rows[1].blocks) == 1
    assert rows[1].blocks[0].text == "hello world"


def test_fast_parser_quoted_gt_in_attribute():
    """Attribute values containing '>' (legal in quoted HTML) must not cut
    the tag short or leak attribute text into block content."""
    html = (
        '<html data-w="800" data-h="600">'
        '<p data-alt="a > b" data-box="10,10,100,30">clean text</p>'
        "<p data-box='20,40,120,60' data-note='x>y'>second</p></html>"
    )
    w, h, (x1, y1, x2, y2, texts, types, parents, scores) = (
        __import__(
            "layout_parser_spark.plans.segment", fromlist=["parse_page_arrays"]
        ).parse_page_arrays(html)
    )
    assert w == 800.0 and h == 600.0
    assert texts == ["clean text", "second"]
    assert (x1, y2) == ([10.0, 20.0], [30.0, 60.0])


def test_xy_cut_deep_nesting_no_recursion_error():
    """Deeply nested alternating x/y gap structure must not blow the
    Python recursion limit (explicit work stack)."""
    import numpy as np

    n = 5000
    # staircase: each block strictly right of and below the previous with
    # gaps on both axes → alternating cuts, depth ~ n
    base = np.arange(n, dtype="float64") * 10.0
    x1, y1 = base, base
    x2, y2 = base + 5.0, base + 5.0
    assert xy_cut_indices(x1, y1, x2, y2) == list(range(n))


def test_lang_filter_pushed_to_scan(spark, tmp_path):
    """A native Column filter placed before the UDF stage must reach the
    parquet scan as a pushed filter (no html decode for skipped rows)."""
    import re
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    src = str(tmp_path / "pages")
    synth_pages(docs).write.parquet(src)
    pages = spark.read.parquet(src).where(F.col("lang") == "en")
    plan = extract_main_text(pages)._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("Scan parquet"):]
    assert re.search(r"PushedFilters: \[.*(EqualTo\(lang,en\)|lang).*\]", scan), scan[:500]


def test_charset_sniffing_in_segmentation(spark):
    """Non-UTF-8 crawl payloads decode via the sniffed charset: a
    shift_jis page with a meta declaration and an undeclared
    windows-1252 page both segment with correct text (a hard utf-8
    decode would mojibake or replace)."""
    from layout_parser_spark.plans.segment import segment_pages

    sj = (
        '<html data-w="100" data-h="100">'
        '<meta charset="shift_jis">'
        '<p data-box="0,0,50,50">こんにちは 世界</p></html>'
    ).encode("shift_jis")
    cp = (
        b'<html data-w="100" data-h="100">'
        b'<p data-box="0,0,50,50">caf\xe9 cr\xe8me</p></html>'
    )  # bare latin-1/cp1252 bytes, NOT valid utf-8, no declaration
    df = spark.createDataFrame(
        [("sj", bytearray(sj)), ("cp", bytearray(cp))],
        "url string, html binary",
    )
    out = {r.url: r.blocks for r in segment_pages(df).collect()}
    assert out["sj"][0].text == "こんにちは 世界"
    assert out["cp"][0].text == "café crème"


def test_charset_utf8_payloads_unchanged(spark):
    """Valid UTF-8 (the overwhelming common case) still decodes
    identically — the sniff must not perturb the flagship contract."""
    from layout_parser_spark.plans.segment import segment_pages

    html = (
        '<html data-w="100" data-h="100">'
        '<p data-box="0,0,50,50">héllo wörld</p></html>'
    ).encode("utf-8")
    df = spark.createDataFrame(
        [("u", bytearray(html))], "url string, html binary"
    )
    out = segment_pages(df).collect()[0]
    assert out.blocks[0].text == "héllo wörld"


def test_pandas_transport_ab_identical(spark, monkeypatch):
    """The LPS_SEGMENT_STAGE=pandas fallback transport (mapInPandas) must
    stay value-identical to the default mapInArrow transport — it is the
    A/B lever for the r5 transport switch, and nothing else exercises it.
    The env var is read at PLAN BUILD time, so monkeypatching around the
    two segment_pages_arrays calls selects the transport per plan."""
    from layout_parser_spark.plans.segment import segment_pages_arrays

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    pages = synth_pages(docs).select("doc_id", "url", "html")

    def run():
        rows = segment_pages_arrays(pages).orderBy("doc_id").collect()
        return [r.asDict(recursive=True) for r in rows]

    monkeypatch.delenv("LPS_SEGMENT_STAGE", raising=False)
    arrow_rows = run()
    monkeypatch.setenv("LPS_SEGMENT_STAGE", "pandas")
    pandas_rows = run()
    assert arrow_rows == pandas_rows
    assert len(arrow_rows) == 60
