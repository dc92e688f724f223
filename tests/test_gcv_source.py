"""Distributed GCV response (de)serialization (sources/gcv.py) pinned
against the reference's protobuf-JSON golden fixture
(/root/reference/tests/fixtures/ocr/test_gcv_response.json) and against
the reference's own Python hierarchy walk (gcv_agent.py:181-274)."""

import json

import pytest

from layout_parser_spark.operators.ocr_agg import gather_full_text
from layout_parser_spark.sources.gcv import (
    gcv_annotation_tokens,
    gcv_symbol_tokens,
    parse_gcv_responses,
    serialize_gcv_responses,
)

FIX = "/root/reference/tests/fixtures/ocr"


@pytest.fixture(scope="module")
def raw_json():
    with open(f"{FIX}/test_gcv_response.json") as f:
        return f.read()


@pytest.fixture(scope="module")
def resp(raw_json):
    return json.loads(raw_json)


@pytest.fixture(scope="module")
def parsed(spark, raw_json):
    df = spark.createDataFrame([("u1", raw_json)], "url string, response string")
    return parse_gcv_responses(df)


def test_roundtrip_fixed_point(spark, parsed):
    """parse → to_json → parse is a fixed point (protobuf-JSON omits unset
    fields; Spark's ignoreNullFields matches)."""
    ser = serialize_gcv_responses(parsed)
    re_parsed = parse_gcv_responses(ser, json_col="response_json", out_col="gcv2")
    row = re_parsed.select("gcv", "gcv2").collect()[0]
    assert row.gcv == row.gcv2


def test_malformed_rows_isolate(spark):
    df = spark.createDataFrame(
        [("bad", "{not json"), ("empty", ""), ("null", None)],
        "url string, response string",
    )
    rows = parse_gcv_responses(df).select("url", "gcv").collect()
    assert all(r.gcv is None or r.gcv == (None, None) for r in rows)


def test_symbol_tokens_match_reference_walk(parsed, resp):
    """Distributed posexplode cascade == the reference iter_level visit
    order (pi, bi, qi, wi, si) with identical text and break types."""
    expected = []
    pos = 0
    for pi, page in enumerate(resp["fullTextAnnotation"]["pages"]):
        for bi, b in enumerate(page["blocks"]):
            for qi, p in enumerate(b["paragraphs"]):
                for wi, w in enumerate(p["words"]):
                    for si, s in enumerate(w["symbols"]):
                        br = s.get("property", {}).get("detectedBreak", {})
                        expected.append(
                            (pi, bi, qi, wi, si, s["text"],
                             br.get("type"), pos)
                        )
                        pos += 1
    got = [
        (r.pi, r.bi, r.qi, r.wi, r.si, r.text, r.break_type, r.pos)
        for r in gcv_symbol_tokens(parsed, ["url"])
        .orderBy("pos")
        .collect()
    ]
    assert got == expected


def test_annotation_tokens_match_reference_walk(parsed, resp):
    """gather_text_annotations input parity: 0th whole-page entry skipped,
    flat clockwise vertex arrays (gcv_agent.py:33-34,192-199)."""
    expected = []
    for i, a in enumerate(resp["textAnnotations"][1:]):
        pts = []
        for v in a["boundingPoly"]["vertices"]:
            pts += [float(v.get("x", 0)), float(v.get("y", 0))]
        expected.append((i, a["description"], pts))
    got = [
        (r.pos, r.text, r.vertices)
        for r in gcv_annotation_tokens(parsed, ["url"]).orderBy("pos").collect()
    ]
    assert got == expected


def test_elided_proto3_vertex_defaults_to_zero(spark):
    """protobuf json_format.Parse reads a missing x/y as 0 — from_json
    yields NULL, which the flattener must coalesce to 0.0."""
    doc = json.dumps(
        {
            "textAnnotations": [
                {"description": "all", "boundingPoly": {"vertices": [{"x": 1}]}},
                {"description": "t", "boundingPoly": {"vertices": [{"y": 7}, {}]}},
            ]
        }
    )
    df = parse_gcv_responses(
        spark.createDataFrame([("u", doc)], "url string, response string")
    )
    (row,) = gcv_annotation_tokens(df, ["url"]).collect()
    assert row.vertices == [0.0, 7.0, 0.0, 0.0]


def test_parse_to_fulltext_e2e(parsed, resp):
    """End-to-end: JSON parse → symbol table → gather_full_text at BLOCK
    level equals the reference join rule (word=''.join(symbols), levels
    above join with ' ' — gcv_agent.py:230-262)."""
    expected = {}
    for pi, page in enumerate(resp["fullTextAnnotation"]["pages"]):
        for bi, b in enumerate(page["blocks"]):
            ptexts = []
            for p in b["paragraphs"]:
                wtexts = [
                    "".join(s["text"] for s in w["symbols"]) for w in p["words"]
                ]
                ptexts.append(" ".join(wtexts))
            expected[(pi, bi)] = " ".join(ptexts)
    sym = gcv_symbol_tokens(parsed, ["url"])
    got = {
        (r.pi, r.bi): r.text
        for r in gather_full_text(sym, ["pi", "bi"], ["qi", "wi"]).collect()
    }
    assert got == expected


def test_single_json_parse_in_token_plans(spark):
    """The token flatteners must evaluate from_json ONCE per row: an
    inner generate lets InferFiltersFromGenerate clone the parse into a
    `size(...) > 0` pre-filter (3 evaluations/row on the annotation
    path).  Pins the outer-generate shape and the empty/NULL-row
    semantics it relies on."""
    import json

    from layout_parser_spark.sources.gcv import (
        gcv_annotation_tokens,
        gcv_symbol_tokens,
        parse_gcv_responses,
    )

    ann = {
        "textAnnotations": [
            {"locale": "en", "description": "a b",
             "boundingPoly": {"vertices": [{"x": 0, "y": 0}, {"x": 2, "y": 0},
                                           {"x": 2, "y": 1}, {"x": 0, "y": 1}]}},
            {"description": "a",
             "boundingPoly": {"vertices": [{"x": 0, "y": 0}, {"x": 1, "y": 0},
                                           {"x": 1, "y": 1}, {"x": 0, "y": 1}]}},
        ]
    }
    df = spark.createDataFrame(
        [("u0", json.dumps(ann)), ("u1", "{}"), ("u2", None)],
        "url string, response string",
    )
    parsed = parse_gcv_responses(df)
    toks = gcv_annotation_tokens(parsed, ["url"])
    # empty / NULL responses contribute no rows, parse happens once
    assert [(r.url, r.pos, r.text) for r in toks.collect()] == [("u0", 0, "a")]
    plan = toks._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1, plan
    syms = gcv_symbol_tokens(parsed, ["url"])
    assert syms.count() == 0  # no fullTextAnnotation anywhere
    plan2 = syms._jdf.queryExecution().optimizedPlan().toString()
    assert plan2.count("from_json") == 1, plan2
