"""Coordinate transforms as Column expressions (SURVEY §2.2).

All transforms preserve TextBlock metadata on the result, mirroring the
reference's ``mixin_textblock_meta`` re-wrapping
(``elements/layout_elements.py:39-48``), and dispatch on the ``block_type``
tag.  ``other``-is-Quadrilateral cases of ``condition_on``/``relative_to``
require a perspective transform (cv2 in the reference,
``elements/utils.py:42-54``) and live in ``perspective.py`` as a vectorized
pandas UDF — never a per-row Python UDF.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import schema as S
from ..schema import INTERVAL, QUADRILATERAL, RECTANGLE
from .geometry import (
    coordinates,
    coords4,
    height,
    is_interval,
    is_quadrilateral,
    is_rectangle,
    px,
    py,
    rect_points,
    width,
)

__all__ = [
    "put_on_canvas",
    "to_interval",
    "to_rectangle",
    "to_quadrilateral",
    "pad",
    "shift",
    "scale",
    "condition_on",
    "relative_to",
]

Num = Union[int, float, Column]


def _lit(v: Num) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


def _keep_meta(b: Column, geom: Column) -> Column:
    """Re-attach b's metadata to a freshly built geometry struct."""
    return S.with_meta(geom, b)


def put_on_canvas(b: Column, canvas_height: Num, canvas_width: Num) -> Column:
    """``Interval.put_on_canvas`` (layout_elements.py:198-222) — set the
    canvas dims; identity for other shapes."""
    return F.when(
        is_interval(b),
        b.withField("canvas_height", _lit(canvas_height).cast("double"))
        .withField("canvas_width", _lit(canvas_width).cast("double")),
    ).otherwise(b)


# ---------------------------------------------------------------------------
# Lattice casts (layout_elements.py:447-463, :768-777, :1119-1130)
# ---------------------------------------------------------------------------
def to_rectangle(b: Column) -> Column:
    """``to_rectangle()`` = Rectangle(*coordinates) for every shape."""
    x1, y1, x2, y2 = coords4(b)
    geom = S.make_block(block_type=RECTANGLE, x_1=x1, y_1=y1, x_2=x2, y_2=y2)
    return F.when(is_rectangle(b), b).otherwise(_keep_meta(b, geom))


def to_interval(
    b: Column,
    axis: str,
    canvas_height: Optional[Num] = None,
    canvas_width: Optional[Num] = None,
) -> Column:
    """``to_interval(axis)`` — project the bbox onto one axis
    (layout_elements.py:768-777 Rectangle, :1119-1130 Quadrilateral).
    Canvas dims default to 0 as in ``Interval.__init__``."""
    x1, y1, x2, y2 = coords4(b)
    if axis == "x":
        start, end = x1, x2
    else:
        start, end = y1, y2
    geom = S.make_block(
        block_type=INTERVAL,
        start=start,
        end=end,
        axis=axis,
        canvas_height=0.0 if canvas_height is None else canvas_height,
        canvas_width=0.0 if canvas_width is None else canvas_width,
    )
    return F.when(
        is_interval(b) & (b["axis"] == axis), b
    ).otherwise(_keep_meta(b, geom))


def to_quadrilateral(b: Column) -> Column:
    """``to_quadrilateral()`` = Quadrilateral(points of bbox)
    (layout_elements.py:452-463, :776-777).  User height/width stay NULL
    (the reference constructs Quadrilateral(points) with no h/w)."""
    geom = S.make_block(block_type=QUADRILATERAL, points=rect_points(b))
    return F.when(is_quadrilateral(b), b).otherwise(_keep_meta(b, geom))


# ---------------------------------------------------------------------------
# pad / shift / scale
# ---------------------------------------------------------------------------
def _stable_rank(vals):
    """Stable ranks of 4 values — rank_i = #{j: v_j < v_i} + #{j<i: v_j==v_i}.

    This reproduces ``points.argsort(axis=0).argsort(axis=0)`` as used by
    ``Quadrilateral.map_to_points_ordering`` (layout_elements.py:920-931);
    numpy's argsort is stable (insertion sort) at n=4."""
    ranks = []
    for i in range(4):
        r = F.lit(0)
        for j in range(4):
            if j == i:
                continue
            lt = (vals[j] < vals[i]).cast("int")
            if j < i:
                eq = (vals[j] == vals[i]).cast("int")
                r = r + lt + eq
            else:
                r = r + lt
        ranks.append(r)
    return ranks


def pad(
    b: Column,
    left: Num = 0,
    right: Num = 0,
    top: Num = 0,
    bottom: Num = 0,
    safe_mode: bool = True,
) -> Column:
    """``pad(left, right, top, bottom, safe_mode)``.

    Interval: grows along its own axis only (layout_elements.py:377-397) —
    the reference merely *warns* on wrong-axis pads, so they are silently
    ignored here; ``safe_mode`` clamps ``start`` at 0 (:394-396).
    Rectangle: grows all four sides; ``safe_mode`` clamps x_1,y_1 at 0
    (:717-728).  Quadrilateral: per-point delta chosen by the point's stable
    coordinate rank (x rank<=1 → -left else +right; y rank<=1 → -top else
    +bottom), then elementwise clamp at 0 (:1063-1074).
    """
    left, right, top, bottom = map(_lit, (left, right, top, bottom))
    zero = F.lit(0.0)

    # interval
    i_start = F.when(b["axis"] == "x", b["start"] - left).otherwise(
        b["start"] - top
    )
    i_end = F.when(b["axis"] == "x", b["end"] + right).otherwise(
        b["end"] + bottom
    )
    if safe_mode:
        i_start = F.greatest(zero, i_start)
    i_res = b.withField("start", i_start).withField("end", i_end)

    # rectangle
    r_x1, r_y1 = b["x_1"] - left, b["y_1"] - top
    if safe_mode:
        r_x1, r_y1 = F.greatest(zero, r_x1), F.greatest(zero, r_y1)
    r_res = (
        b.withField("x_1", r_x1)
        .withField("y_1", r_y1)
        .withField("x_2", b["x_2"] + right)
        .withField("y_2", b["y_2"] + bottom)
    )

    # quadrilateral
    xs = [px(b, i) for i in range(4)]
    ys = [py(b, i) for i in range(4)]
    xr = _stable_rank(xs)
    yr = _stable_rank(ys)
    new_pts = []
    for i in range(4):
        nx = xs[i] + F.when(xr[i] <= 1, -left).otherwise(right)
        ny = ys[i] + F.when(yr[i] <= 1, -top).otherwise(bottom)
        if safe_mode:
            nx, ny = F.greatest(zero, nx), F.greatest(zero, ny)
        new_pts.extend([nx, ny])
    q_res = b.withField("points", F.array(*new_pts))

    return (
        F.when(is_interval(b), i_res)
        .when(is_rectangle(b), r_res)
        .otherwise(q_res)
    )


def shift(b: Column, dx: Num, dy: Optional[Num] = None) -> Column:
    """``shift(distance)`` — scalar or (dx, dy)
    (layout_elements.py:399-420 / :730-745 / :1076-1088).  A scalar shift on
    an Interval moves it along its own axis; a pair shift picks the matching
    component (:401-406)."""
    scalar = dy is None
    dx = _lit(dx)
    dy = dx if scalar else _lit(dy)

    i_d = dx if scalar else F.when(b["axis"] == "x", dx).otherwise(dy)
    i_res = b.withField("start", b["start"] + i_d).withField(
        "end", b["end"] + i_d
    )
    r_res = (
        b.withField("x_1", b["x_1"] + dx)
        .withField("y_1", b["y_1"] + dy)
        .withField("x_2", b["x_2"] + dx)
        .withField("y_2", b["y_2"] + dy)
    )
    q_pts = []
    for i in range(4):
        q_pts.extend([px(b, i) + dx, py(b, i) + dy])
    q_res = b.withField("points", F.array(*q_pts))
    return (
        F.when(is_interval(b), i_res)
        .when(is_rectangle(b), r_res)
        .otherwise(q_res)
    )


def scale(b: Column, fx: Num, fy: Optional[Num] = None) -> Column:
    """``scale(factor)`` — scalar or (fx, fy)
    (layout_elements.py:422-441 / :747-762 / :1090-1102)."""
    scalar = fy is None
    fx = _lit(fx)
    fy = fx if scalar else _lit(fy)

    i_f = fx if scalar else F.when(b["axis"] == "x", fx).otherwise(fy)
    i_res = b.withField("start", b["start"] * i_f).withField(
        "end", b["end"] * i_f
    )
    r_res = (
        b.withField("x_1", b["x_1"] * fx)
        .withField("y_1", b["y_1"] * fy)
        .withField("x_2", b["x_2"] * fx)
        .withField("y_2", b["y_2"] * fy)
    )
    q_pts = []
    for i in range(4):
        q_pts.extend([px(b, i) * fx, py(b, i) * fy])
    q_res = b.withField("points", F.array(*q_pts))
    return (
        F.when(is_interval(b), i_res)
        .when(is_rectangle(b), r_res)
        .otherwise(q_res)
    )


# ---------------------------------------------------------------------------
# condition_on / relative_to (non-perspective cases)
# ---------------------------------------------------------------------------
def _cond_rel(b: Column, other: Column, sign: int) -> Column:
    """Shared body of condition_on (sign=+1) / relative_to (sign=-1).

    Dispatch matrix (self × other), cf. layout_elements.py:

    * I×I same axis — shift by other.start AND reset canvas dims to 0
      (:224-244 `# Reset the canvas size in the absolute coordinates`);
      cross-axis — unchanged copy (:233-234).
    * I×R — put_on_canvas(other).to_rectangle() then translate by other's
      origin (:236-239).
    * R×I / Q×I — translate by (start, 0) or (0, start) (:561-574,
      :933-945).
    * R×R / Q×R — translate by (other.x_1, other.y_1).
    * any×Q — perspective transform; handled in ``perspective.py``
      (this expression yields NULL for those rows so the caller can route
      them through the UDF; see ``perspective.condition_on_any``).

    Implementation note: built as ONE flat struct with per-field when-chains
    (not nested struct rebuilds) to keep the Catalyst tree linear in the
    size of ``b``/``other``.
    """
    sgn = F.lit(float(sign))
    nd = F.lit(None).cast("double")

    bi, br, bq = is_interval(b), is_rectangle(b), is_quadrilateral(b)
    oi, orr = is_interval(other), is_rectangle(other)

    same_axis = b["axis"] == other["axis"]
    d = other["start"] * sgn

    # translation applied to rect/quad self: interval other → (start,0)/(0,start);
    # rectangle other → (x_1, y_1)
    dx = (
        F.when(
            oi,
            F.when(other["axis"] == "x", other["start"]).otherwise(F.lit(0.0)),
        ).otherwise(other["x_1"])
        * sgn
    )
    dy = (
        F.when(
            oi,
            F.when(other["axis"] == "x", F.lit(0.0)).otherwise(other["start"]),
        ).otherwise(other["y_1"])
        * sgn
    )

    # I×R: promote onto other's canvas (h=other.height, w=other.width) then
    # translate by other's origin: axis x → (start,0,end,oh); axis y →
    # (0,start,ow,end).
    oh = other["y_2"] - other["y_1"]
    ow = other["x_2"] - other["x_1"]
    ir_x1 = F.when(b["axis"] == "x", b["start"]).otherwise(F.lit(0.0))
    ir_y1 = F.when(b["axis"] == "x", F.lit(0.0)).otherwise(b["start"])
    ir_x2 = F.when(b["axis"] == "x", b["end"]).otherwise(ow)
    ir_y2 = F.when(b["axis"] == "x", oh).otherwise(b["end"])

    ii = bi & oi
    ir = bi & orr

    block_type = (
        F.when(ii, F.lit(INTERVAL))
        .when(ir, F.lit(RECTANGLE))
        .otherwise(b["block_type"])
    )
    start = F.when(ii & same_axis, b["start"] + d).when(ii, b["start"]).otherwise(nd)
    end = F.when(ii & same_axis, b["end"] + d).when(ii, b["end"]).otherwise(nd)
    axis = F.when(ii, b["axis"]).otherwise(F.lit(None).cast("string"))
    # same-axis: canvas reset to 0; cross-axis: unchanged copy
    canvas_h = (
        F.when(ii & same_axis, F.lit(0.0))
        .when(ii, b["canvas_height"])
        .otherwise(nd)
    )
    canvas_w = (
        F.when(ii & same_axis, F.lit(0.0))
        .when(ii, b["canvas_width"])
        .otherwise(nd)
    )
    x_1 = (
        F.when(ir, ir_x1 + other["x_1"] * sgn)
        .when(br, b["x_1"] + dx)
        .otherwise(nd)
    )
    y_1 = (
        F.when(ir, ir_y1 + other["y_1"] * sgn)
        .when(br, b["y_1"] + dy)
        .otherwise(nd)
    )
    x_2 = (
        F.when(ir, ir_x2 + other["x_1"] * sgn)
        .when(br, b["x_2"] + dx)
        .otherwise(nd)
    )
    y_2 = (
        F.when(ir, ir_y2 + other["y_1"] * sgn)
        .when(br, b["y_2"] + dy)
        .otherwise(nd)
    )
    q_pts = []
    for i in range(4):
        q_pts.extend([px(b, i) + dx, py(b, i) + dy])
    points = F.when(bq, F.array(*q_pts)).otherwise(
        F.lit(None).cast("array<double>")
    )
    q_height = F.when(bq, b["height"]).otherwise(nd)
    q_width = F.when(bq, b["width"]).otherwise(nd)

    geom = S.make_block(
        block_type=block_type,
        start=start,
        end=end,
        axis=axis,
        canvas_height=canvas_h,
        canvas_width=canvas_w,
        x_1=x_1,
        y_1=y_1,
        x_2=x_2,
        y_2=y_2,
        points=points,
        height=q_height,
        width=q_width,
    )
    null_block = F.lit(None).cast(S.TEXTBLOCK)
    return F.when(is_quadrilateral(other), null_block).otherwise(
        _keep_meta(b, geom)
    )


def condition_on(b: Column, other: Column) -> Column:
    """Relative→absolute coordinates (layout_elements.py:224-244, :561-589,
    :933-955).  Quadrilateral ``other`` → NULL here; route through
    ``perspective.condition_on_quad``."""
    return _cond_rel(b, other, +1)


def relative_to(b: Column, other: Column) -> Column:
    """Absolute→relative coordinates — the inverse of ``condition_on``
    (layout_elements.py:246-266, :591-618, :957-979)."""
    return _cond_rel(b, other, -1)
