"""Property-based geometry tests: the Spark expression library vs the
pure-python oracle (tests/geom_oracle.py) over randomized shape batches.

Batched design: hypothesis generates LISTS of shape pairs; each example
costs one Spark collect (a per-example round trip would be prohibitive)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import geom_oracle as G
from layout_parser_spark import schema as S
from layout_parser_spark.functions import intersect, is_in, pad, union

finite = st.floats(
    min_value=-50, max_value=50, allow_nan=False, allow_infinity=False,
    width=32,
)
pos = st.floats(
    min_value=0, max_value=60, allow_nan=False, allow_infinity=False,
    width=32,
)


@st.composite
def interval_s(draw):
    a = draw(finite)
    b = draw(finite)
    return {
        "kind": "i",
        "start": min(a, b),
        "end": max(a, b),
        "axis": draw(st.sampled_from(["x", "y"])),
        "ch": draw(pos),
        "cw": draw(pos),
    }


@st.composite
def rect_s(draw):
    x1, x2 = sorted((draw(finite), draw(finite)))
    y1, y2 = sorted((draw(finite), draw(finite)))
    return {"kind": "r", "x1": x1, "y1": y1, "x2": x2, "y2": y2}


@st.composite
def quad_s(draw):
    """Convex clockwise quad: center + 4 angular offsets."""
    cx, cy = draw(finite), draw(finite)
    # clockwise in screen coords (y down): TL, TR, BR, BL
    w1, w2 = draw(pos) + 1, draw(pos) + 1
    h1, h2 = draw(pos) + 1, draw(pos) + 1
    pts = [
        (cx - w1, cy - h1),
        (cx + w2, cy - h1),
        (cx + w2, cy + h2),
        (cx - w1, cy + h2),
    ]
    return {"kind": "q", "pts": pts}


shape_s = st.one_of(interval_s(), rect_s(), quad_s())


def to_block(s):
    if s["kind"] == "i":
        return S.interval(s["start"], s["end"], s["axis"], s["ch"], s["cw"])
    if s["kind"] == "r":
        return S.rectangle(s["x1"], s["y1"], s["x2"], s["y2"])
    flat = [c for p in s["pts"] for c in p]
    return S.quadrilateral(flat)


def _close(a, b, tol=1e-6):
    if a is None or b is None:
        return a == b
    if isinstance(a, str):
        return a == b
    return math.isclose(float(a), float(b), rel_tol=tol, abs_tol=tol)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(st.tuples(shape_s, shape_s), min_size=1, max_size=25))
def test_is_in_matches_oracle(spark, pairs):
    base = spark.range(1)
    exprs = []
    for i, (a, o) in enumerate(pairs):
        exprs.append(is_in(to_block(a), to_block(o)).alias(f"f{i}"))
        exprs.append(
            is_in(to_block(a), to_block(o), center=True).alias(f"c{i}")
        )
    row = base.select(*exprs).collect()[0].asDict()
    for i, (a, o) in enumerate(pairs):
        assert row[f"f{i}"] == G.is_in(a, o), (a, o)
        assert row[f"c{i}"] == G.is_in(a, o, center_mode=True), (a, o)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(st.tuples(shape_s, shape_s), min_size=1, max_size=15))
def test_intersect_union_match_oracle(spark, pairs):
    base = spark.range(1)
    exprs = []
    for i, (a, o) in enumerate(pairs):
        exprs.append(
            intersect(to_block(a), to_block(o), strict=False).alias(f"i{i}")
        )
        # skip cross-axis interval unions (reference raises)
        if not (
            a["kind"] == "i" and o["kind"] == "i" and a["axis"] != o["axis"]
        ):
            exprs.append(
                union(to_block(a), to_block(o), strict=False).alias(f"u{i}")
            )
    row = base.select(*exprs).collect()[0].asDict()
    for i, (a, o) in enumerate(pairs):
        exp = G.intersect(a, o)
        got = row[f"i{i}"]
        _check_shape(got, exp, (a, o, "intersect"))
        if f"u{i}" in row:
            expu = G.union(a, o)
            _check_shape(row[f"u{i}"], expu, (a, o, "union"))


def _check_shape(got, exp, ctx):
    if exp[0] == "i":
        assert got.block_type == "interval", ctx
        assert _close(got.start, exp[1]) and _close(got.end, exp[2]), (
            ctx, got, exp)
        assert got.axis == exp[3]
        assert _close(got.canvas_height, exp[4]) and _close(
            got.canvas_width, exp[5]
        ), (ctx, got, exp)
    else:
        assert got.block_type == "rectangle", (ctx, got, exp)
        for g, e in zip((got.x_1, got.y_1, got.x_2, got.y_2), exp[1:]):
            assert _close(g, e), (ctx, got, exp)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(shape_s, min_size=1, max_size=20),
    st.tuples(pos, pos, pos, pos),
    st.booleans(),
)
def test_pad_matches_oracle(spark, shapes, margins, safe):
    left, right, top, bottom = margins
    exprs = [
        pad(
            to_block(s), left=left, right=right, top=top, bottom=bottom,
            safe_mode=safe,
        ).alias(f"p{i}")
        for i, s in enumerate(shapes)
    ]
    row = spark.range(1).select(*exprs).collect()[0].asDict()
    for i, s in enumerate(shapes):
        exp = G.pad(s, left, right, top, bottom, safe=safe)
        got = row[f"p{i}"]
        if s["kind"] == "i":
            assert _close(got.start, exp["start"]) and _close(
                got.end, exp["end"]
            ), (s, got, exp)
        elif s["kind"] == "r":
            for g, k in ((got.x_1, "x1"), (got.y_1, "y1"),
                         (got.x_2, "x2"), (got.y_2, "y2")):
                assert _close(g, exp[k]), (s, got, exp)
        else:
            flat = [c for p in exp["pts"] for c in p]
            for g, e in zip(got.points, flat):
                assert _close(g, e), (s, got, exp)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(st.tuples(rect_s(), rect_s()), min_size=1, max_size=20))
def test_xy_cut_is_permutation(spark, pairs):
    """xy_cut over arbitrary rect sets returns a valid permutation and is
    deterministic."""
    import numpy as np

    from layout_parser_spark.plans.reading_order import xy_cut_indices

    rects = [p[0] for p in pairs]
    x1 = np.array([r["x1"] for r in rects])
    y1 = np.array([r["y1"] for r in rects])
    x2 = np.array([r["x2"] for r in rects])
    y2 = np.array([r["y2"] for r in rects])
    order = xy_cut_indices(x1, y1, x2, y2)
    assert sorted(order) == list(range(len(rects)))
    assert order == xy_cut_indices(x1, y1, x2, y2)
