"""Replay the reference's OWN OCR golden fixtures through the engine.

The reference pins its OCR aggregation with real captured responses
(tests/test_ocr.py:26-96): a pickled Tesseract TSV DataFrame and a GCV
AnnotateImageResponse JSON.  Here those exact fixtures are decoded into
token tables and pushed through the engine's gather_data /
gather_full_text / gather_text_annotations; the oracle is a direct
pure-pandas/pure-python port of the reference's aggregation code
(tesseract_agent.py:135-181, gcv_agent.py:205-274) run on the same
fixture — byte-equal text, exact coordinates/ids, 1e-9 scores.
"""

import json
import pickle

import pandas as pd
import pytest
from pyspark.sql import functions as F

from layout_parser_spark.operators.ocr_agg import (
    TESSERACT_LEVELS,
    gather_data,
    gather_full_text,
    gather_text_annotations,
)

FIX = "/root/reference/tests/fixtures/ocr"


# ---------------------------------------------------------------------------
# Tesseract pickle → gather_data at all 5 levels
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tess_tokens():
    with open(f"{FIX}/test_tesseract_response.pickle", "rb") as f:
        res = pickle.load(f)
    pdf = res["data"].copy()
    pdf["pos"] = range(len(pdf))  # original row order = pandas implicit order
    return pdf


def _ref_gather_data(pdf: pd.DataFrame, group_levels):
    """Direct port of TesseractAgent.gather_data (tesseract_agent.py:135-181):
    drop NaN text, groupby (sorted keys), min/min/max/max/mean/' '-cat,
    positional id, x_2 = x_1 + w."""
    res = pdf[~pdf.text.isna()]
    out = {}
    for i, (_, gp) in enumerate(res.groupby(group_levels)):
        x1 = gp["left"].min()
        y1 = gp["top"].min()
        w = gp["width"].max()
        h = gp["height"].max()
        out[i] = (
            float(x1),
            float(y1),
            float(x1 + w),
            float(y1 + h),
            float(gp["conf"].mean()),
            gp["text"].str.cat(sep=" "),
        )
    return out


@pytest.mark.parametrize("level", ["page", "block", "para", "line", "word"])
def test_tesseract_golden_fixture_parity(spark, tess_tokens, level):
    group_cols = TESSERACT_LEVELS[level]
    expected = _ref_gather_data(tess_tokens, group_cols)

    pdf = tess_tokens.copy()
    pdf["text"] = pdf["text"].where(pdf["text"].notna(), None)
    sdf = spark.createDataFrame(
        pdf[
            ["page_num", "block_num", "par_num", "line_num", "word_num",
             "left", "top", "width", "height", "conf", "text", "pos"]
        ]
    )
    got = {
        r.id: (r.x_1, r.y_1, r.x_2, r.y_2, r.score, r.text)
        for r in gather_data(sdf, group_cols).collect()
    }
    assert set(got) == set(expected)
    for i in sorted(expected):
        e, g = expected[i], got[i]
        assert g[5] == e[5], (level, i, g[5], e[5])  # byte-equal text
        assert tuple(float(v) for v in g[:4]) == e[:4], (level, i)
        assert abs(g[4] - e[4]) < 1e-9, (level, i, g[4], e[4])


def test_tesseract_fixture_word_level_is_tokens(tess_tokens):
    """Sanity on the fixture itself: word level has one group per token."""
    n_tokens = int((~tess_tokens.text.isna()).sum())
    assert len(_ref_gather_data(tess_tokens, TESSERACT_LEVELS["word"])) == n_tokens


# ---------------------------------------------------------------------------
# GCV JSON → gather_full_text at WORD/PARA/BLOCK/PAGE + text annotations
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def gcv_resp():
    with open(f"{FIX}/test_gcv_response.json") as f:
        return json.load(f)


def _gcv_symbol_rows(resp):
    rows = []
    pos = 0
    for pi, page in enumerate(resp["fullTextAnnotation"]["pages"]):
        for bi, b in enumerate(page["blocks"]):
            for qi, p in enumerate(b["paragraphs"]):
                for wi, w in enumerate(p["words"]):
                    for s in w["symbols"]:
                        rows.append((pi, bi, qi, wi, s["text"], pos))
                        pos += 1
    return rows


def _ref_hierarchy_texts(resp):
    """Port of GCVAgent.gather_full_text_annotation's iter_level join rule
    (gcv_agent.py:230-262): word = ''.join(symbols); every level above
    joins its children with ' '."""
    words, paras, blocks = {}, {}, {}
    for pi, page in enumerate(resp["fullTextAnnotation"]["pages"]):
        for bi, b in enumerate(page["blocks"]):
            ptexts = []
            for qi, p in enumerate(b["paragraphs"]):
                wtexts = []
                for wi, w in enumerate(p["words"]):
                    t = "".join(s["text"] for s in w["symbols"])
                    words[(pi, bi, qi, wi)] = t
                    wtexts.append(t)
                paras[(pi, bi, qi)] = " ".join(wtexts)
                ptexts.append(paras[(pi, bi, qi)])
            blocks[(pi, bi)] = " ".join(ptexts)
    pages = {}
    for (pi, bi), t in sorted(blocks.items()):
        pages.setdefault((pi,), []).append(t)
    pages = {k: " ".join(v) for k, v in sorted(pages.items())}
    return words, paras, blocks, pages


@pytest.mark.parametrize(
    "agg", ["word", "para", "block", "page"]
)
def test_gcv_golden_fixture_full_text_parity(spark, gcv_resp, agg):
    rows = _gcv_symbol_rows(gcv_resp)
    sdf = spark.createDataFrame(
        rows, "pi long, bi long, qi long, wi long, text string, pos long"
    )
    words, paras, blocks, pages = _ref_hierarchy_texts(gcv_resp)
    doc_cols, levels, expected = {
        "word": (["pi", "bi", "qi", "wi"], [], words),
        "para": (["pi", "bi", "qi"], ["wi"], paras),
        "block": (["pi", "bi"], ["qi", "wi"], blocks),
        # reference PAGE agg is a passthrough of textAnnotations[0]
        # .description (gcv_agent.py:263-267, includes break-aware
        # punctuation), not a hierarchy join — the engine's page level is
        # pinned against the hierarchy-join oracle instead
        "page": (["pi"], ["bi", "qi", "wi"], pages),
    }[agg]
    got = {
        tuple(r[c] for c in doc_cols): r.text
        for r in gather_full_text(sdf, doc_cols, levels).collect()
    }
    assert got == expected


def test_gcv_golden_fixture_text_annotations(spark, gcv_resp):
    """gather_text_annotations parity: one quad TextBlock per annotation
    (skipping the 0th whole-page entry), id = enumeration order
    (gcv_agent.py:181-203)."""
    anns = gcv_resp["textAnnotations"][1:]
    rows = []
    for i, a in enumerate(anns):
        pts = []
        for v in a["boundingPoly"]["vertices"]:
            pts.extend([float(v.get("x", 0)), float(v.get("y", 0))])
        rows.append((0, pts, a["description"], i))
    sdf = spark.createDataFrame(
        rows, "doc long, vertices array<double>, text string, pos long"
    )
    out = gather_text_annotations(sdf, ["doc"]).collect()
    assert len(out) == len(anns)
    by_id = {r.block.id: r.block for r in out}
    for i, a in enumerate(anns):
        blk = by_id[i]
        assert blk.text == a["description"]
        exp = []
        for v in a["boundingPoly"]["vertices"]:
            exp.extend([float(v.get("x", 0)), float(v.get("y", 0))])
        assert list(blk.points) == exp
