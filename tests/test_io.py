"""IO round-trips (SURVEY §2.6): JSON wire-format parity against the
reference's own golden fixtures (read from /root/reference/tests/fixtures/
io when present), CSV exploded view, PDF source plumbing with an injected
extractor."""

import json
import os

import pytest
from pyspark.sql import functions as F

from layout_parser_spark import schema as S
from layout_parser_spark.sources.io import (
    blocks_to_exploded,
    collect_exploded,
    from_json_layout,
    layout_to_json,
    load_csv_blocks,
    load_dict,
)
from layout_parser_spark.sources.pdf import load_pdf_pages, words_to_blocks

FIXDIR = "/root/reference/tests/fixtures/io"


def _mk_layout_df(spark):
    rows = [
        (
            0,
            {"width": 100.0, "height": 50.0, "index": 0},
            [
                S.block_dict_to_row(
                    {"block_type": "rectangle", "x_1": 1, "y_1": 2,
                     "x_2": 3, "y_2": 4, "text": "hi", "id": 0}
                ),
                S.block_dict_to_row(
                    {"block_type": "interval", "start": 1, "end": 2,
                     "axis": "y", "canvas_height": 5, "canvas_width": 0}
                ),
                S.block_dict_to_row(
                    {"block_type": "quadrilateral",
                     "points": [1, 2, 3, 4, 5, 6, 7, 8], "score": 0.9}
                ),
            ],
        )
    ]
    schema = f"doc_id long, page_data {S.LAYOUT['page_data'].dataType.simpleString()}, blocks {S.LAYOUT['blocks'].dataType.simpleString()}"
    return spark.createDataFrame(rows, schema)


def test_json_roundtrip(spark):
    df = _mk_layout_df(spark)
    as_json = layout_to_json(df)
    back = as_json.select(
        "doc_id", from_json_layout(F.col("layout_json")).alias("l")
    ).select("doc_id", F.col("l.page_data").alias("page_data"),
             F.col("l.blocks").alias("blocks"))
    a = df.collect()[0]
    b = back.collect()[0]
    assert a.page_data == b.page_data
    assert a.blocks == b.blocks
    # sparse wire format: null fields are dropped, like reference to_dict
    j = json.loads(as_json.collect()[0].layout_json)
    assert "start" not in j["blocks"][0]  # rectangle carries no interval keys
    assert j["blocks"][0]["x_1"] == 1.0 and j["blocks"][0]["text"] == "hi"


@pytest.mark.skipif(not os.path.isdir(FIXDIR), reason="reference fixtures absent")
def test_reference_golden_fixtures(spark):
    """Feed the reference's own golden layout JSONs through the struct
    schema: every element must land with the right tag + features."""
    with open(f"{FIXDIR}/layout.json") as f:
        doc = json.load(f)
    row = load_dict(doc)
    schema = f"page_data {S.LAYOUT['page_data'].dataType.simpleString()}, blocks {S.LAYOUT['blocks'].dataType.simpleString()}"
    df = spark.createDataFrame([row], schema)
    got = df.collect()[0]
    assert len(got.blocks) == len(doc["blocks"])
    for ours, ref in zip(got.blocks, doc["blocks"]):
        assert ours.block_type == ref["block_type"]
        for k, v in ref.items():
            if k in ("block_type",):
                continue
            mine = getattr(ours, k)
            if isinstance(v, list):
                assert [float(x) for x in v] == list(mine)
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                assert float(v) == pytest.approx(float(mine))
            else:
                assert v == mine, (k, v, mine)


@pytest.mark.skipif(not os.path.isdir(FIXDIR), reason="reference fixtures absent")
def test_reference_csv_fixture(spark):
    """reference tests/fixtures/io/layout.csv → exploded view with id
    auto-assignment by row order (io/basic.py:143-147)."""
    df = load_csv_blocks(spark, f"{FIXDIR}/layout.csv")
    rows = df.collect()
    assert len(rows) > 0
    tags = {r.block_type for r in rows}
    assert tags <= {"interval", "rectangle", "quadrilateral"}
    # this fixture carries no TextBlock features → no id auto-assignment
    assert all(r.id is None for r in rows)
    # interval row parsed with its features
    iv = [r for r in rows if r.block_type == "interval"][0]
    assert (iv.start, iv.end, iv.axis) == (1.0, 2.0, "y")

    # a csv WITH TextBlock features gets dense 0-based ids in row order
    import tempfile, os
    d = tempfile.mkdtemp()
    p2 = os.path.join(d, "tb.csv")
    with open(p2, "w") as f:
        f.write("block_type,x_1,y_1,x_2,y_2,text\n")
        f.write("rectangle,1,1,2,2,aa\n")
        f.write("rectangle,3,3,4,4,bb\n")
    df2 = load_csv_blocks(spark, p2)
    got = {r.text: r.id for r in df2.collect()}
    assert got == {"aa": 0, "bb": 1}


def test_exploded_roundtrip(spark):
    df = _mk_layout_df(spark)
    ex = blocks_to_exploded(df)
    assert ex.count() == 3
    back = collect_exploded(ex.drop("page_data"), ["doc_id"])
    a = df.select("blocks").collect()[0].blocks
    b = back.select("blocks").collect()[0].blocks
    assert a == b


def test_pdf_plumbing_with_fake_extractor(spark):
    """PDF source: binary payload → per-page token blocks, extractor
    injected (pdfplumber absent in this container)."""

    def fake_extractor(payload: bytes):
        n = len(payload)
        words = [
            {"x0": -5.0, "x1": 30.0, "top": 10.0, "bottom": 20.0,
             "text": "hello", "fontname": "F0"},
            {"x0": 35.0, "x1": 900.0, "top": 10.0, "bottom": 20.0,
             "text": "world", "fontname": "F1"},
        ]
        return [(0, 600.0, 800.0, words_to_blocks(words, 600.0, 800.0)),
                (1, 600.0, 800.0, [])]

    df = spark.createDataFrame([("u1", b"%PDF-fake")], "url string, payload binary")
    out = load_pdf_pages(df, extractor=fake_extractor)
    rows = {r.page_data["index"]: r for r in out.collect()}
    assert set(rows) == {0, 1}
    blocks = rows[0].blocks
    assert [b.text for b in blocks] == ["hello", "world"]
    # clip to page box (io/pdf.py:60-65)
    assert blocks[0].x_1 == 0.0 and blocks[1].x_2 == 600.0
    # fontname → type, id = index
    assert blocks[0].type == "F0" and blocks[1].id == 1
    assert rows[1].blocks == []


def test_model_config_registry(spark):
    from layout_parser_spark.models import (
        PUBLAYNET_LABELS,
        auto_layout_model,
        parse_model_config,
    )

    cfg = parse_model_config(
        "lp://detectron2/PubLayNet/faster_rcnn_R_50_FPN_3x/config"
    )
    assert cfg.backend == "detectron2"
    assert cfg.label_map == PUBLAYNET_LABELS
    cfg2 = parse_model_config("lp://effdet/PubLayNet/tf_efficientdet_d0/config")
    assert cfg2.score_threshold == 0.25
    with pytest.raises(ValueError):
        parse_model_config("http://nope")

    # the dom backend routes to the segmentation stage and runs
    from layout_parser_spark.sources import render_page_html

    pages = spark.createDataFrame(
        [("u", render_page_html(1, "a b c d e f g h i j k l").encode())],
        "url string, html binary",
    )
    backend = auto_layout_model("lp://dom/web/heuristic/config")
    out = backend(pages)
    assert out.select(F.size("blocks")).collect()[0][0] > 0


def test_gcv_text_annotations(spark):
    """gather_text_annotations: quad per token, id by enumeration order
    (gcv_agent.py:181-203)."""
    from layout_parser_spark.operators.ocr_agg import gather_text_annotations

    rows = [
        (1, 20, [4.0, 4.0, 6.0, 4.0, 6.0, 6.0, 4.0, 6.0], "world"),
        (1, 10, [0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0], "hello"),
        (2, 5, [1.0, 1.0, 3.0, 1.0, 3.0, 3.0, 1.0, 3.0], "solo"),
    ]
    df = spark.createDataFrame(
        rows, "doc long, pos long, vertices array<double>, text string"
    )
    out = gather_text_annotations(df, ["doc"])
    got = sorted(
        [(r.doc, r.block["id"], r.block["text"]) for r in out.collect()]
    )
    assert got == [(1, 0, "hello"), (1, 1, "world"), (2, 0, "solo")]
    blk = [r.block for r in out.collect() if r.block["text"] == "hello"][0]
    assert blk["block_type"] == "quadrilateral"
    assert list(blk["points"]) == [0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0]


def test_viz_svg_sample(spark):
    from layout_parser_spark.plans.segment import segment_pages
    from layout_parser_spark.sources import render_page_html
    from layout_parser_spark.viz import draw_sample

    pages = spark.createDataFrame(
        [("u", render_page_html(5, " ".join(f"w{i}" for i in range(30))).encode())],
        "url string, html binary",
    )
    svgs = draw_sample(segment_pages(pages), n=1)
    assert len(svgs) == 1
    assert svgs[0].startswith("<svg") and "rect" in svgs[0]
    assert "Figure" in svgs[0] and "Nav" in svgs[0]


def test_draw_text_svg_side_by_side():
    """draw_text analogue (reference visualization.py:417-571): side-by-side
    panels, text at block coordinates on the second panel, reference-style
    argument validation."""
    import pytest as _pytest

    from layout_parser_spark.viz import draw_text_svg

    blocks = [
        {"block_type": "rectangle", "x_1": 10.0, "y_1": 20.0, "x_2": 110.0,
         "y_2": 40.0, "text": "hello", "type": "Text", "score": 1.0},
        {"block_type": "rectangle", "x_1": 10.0, "y_1": 60.0, "x_2": 110.0,
         "y_2": 80.0, "text": "<world>", "type": "Title", "score": 0.5},
    ]
    svg = draw_text_svg(200.0, 100.0, blocks, arrangement="lr")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert 'viewBox="0 0 400 100"' in svg  # lr doubles the width
    assert "hello" in svg and "&lt;world&gt;" in svg  # text escaped
    # text panel entries are shifted by page_w
    assert 'x="210.0"' in svg

    svg_ud = draw_text_svg(200.0, 100.0, blocks, arrangement="ud")
    assert 'viewBox="0 0 200 200"' in svg_ud  # ud doubles the height

    with _pytest.raises(ValueError, match="text_background_alpha"):
        draw_text_svg(200, 100, blocks, text_background_alpha=1.5)
    with _pytest.raises(ValueError, match="text_box_alpha"):
        draw_text_svg(200, 100, blocks, text_box_alpha=-0.1)
    with _pytest.raises(ValueError, match="arrangement"):
        draw_text_svg(200, 100, blocks, arrangement="diagonal")

    boxed = draw_text_svg(200, 100, blocks, with_box_on_text=True,
                          with_layout=True)
    assert 'stroke-opacity="0.50"' in boxed
    assert 'transform="translate(200,0)"' in boxed


def test_load_csv_multifile_deterministic_ids(spark, tmp_path):
    """Multi-file glob: auto-ids are dense per document over
    (lexicographic file path, within-file row order) — deterministic at
    any parallelism, the SURVEY §7 'no monotonically_increasing_id as a
    value' promise for the CSV source."""
    from layout_parser_spark.sources.io import load_csv_blocks

    hdr = "doc,x_1,y_1,x_2,y_2,text\n"
    (tmp_path / "a.csv").write_text(
        hdr + "d1,0,0,1,1,w0\nd2,0,0,1,1,w1\nd1,2,0,3,1,w2\n"
    )
    (tmp_path / "b.csv").write_text(
        hdr + "d1,4,0,5,1,w3\nd2,2,0,3,1,w4\n"
    )
    expected = {
        # file a before file b; per-doc dense 0-based
        ("d1", "w0"): 0, ("d1", "w2"): 1, ("d1", "w3"): 2,
        ("d2", "w1"): 0, ("d2", "w4"): 1,
    }
    for _ in range(2):  # repeat read → identical assignment
        rows = load_csv_blocks(
            spark, str(tmp_path / "*.csv"), doc_id_col="doc"
        ).collect()
        got = {(r.doc, r.text): r.id for r in rows}
        assert got == expected


def test_load_csv_quoted_newline(spark, tmp_path):
    """multiLine read parses quoted embedded newlines instead of tearing
    the record."""
    from layout_parser_spark.sources.io import load_csv_blocks

    (tmp_path / "c.csv").write_text(
        'x_1,y_1,x_2,y_2,text\n0,0,1,1,"line1\nline2"\n'
    )
    rows = load_csv_blocks(spark, str(tmp_path / "c.csv")).collect()
    assert len(rows) == 1
    assert rows[0].text == "line1\nline2"
    assert rows[0].id == 0
