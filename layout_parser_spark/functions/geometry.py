"""Scalar geometric properties as pure Column expressions (SURVEY §2.1).

Every function takes a TEXTBLOCK struct Column (see ``schema.py``) and
returns a Column, dispatching on the ``block_type`` tag with ``F.when``
chains — the columnar re-expression of the reference's ``isinstance``
dispatch.  Because these are plain Catalyst expressions (no UDFs), they run
inside whole-stage codegen and are fully optimizable.

Reference semantics (file:line cites into /root/reference):

* ``Interval.height/width`` — axis-dependent: along-x intervals take their
  height from the canvas, width from ``end-start`` (and symmetrically for
  along-y) — ``elements/layout_elements.py:117-145``.
* ``Interval.coordinates`` — promotes the 1-D band to a 4-tuple on the
  canvas: ``(start, 0, end, canvas_height)`` for axis='x', ``(0, start,
  canvas_width, end)`` for axis='y' — ``layout_elements.py:147-163``.
* ``Rectangle`` props — straightforward box math,
  ``layout_elements.py:498-559``.
* ``Quadrilateral.height/width`` — user-specified value if present, else the
  bbox extent of the 4 points — ``layout_elements.py:838-862``.
* ``Quadrilateral.area`` — shoelace formula (``elements/utils.py:69-82``),
  expanded here to the fixed 4-term expression for 4 points.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schema import INTERVAL, QUADRILATERAL, RECTANGLE

__all__ = [
    "is_interval",
    "is_rectangle",
    "is_quadrilateral",
    "px",
    "py",
    "coordinates",
    "coords4",
    "coord",
    "width",
    "height",
    "area",
    "center_x",
    "center_y",
    "interval_center",
    "rect_points",
]


def is_interval(b: Column) -> Column:
    return b["block_type"] == INTERVAL


def is_rectangle(b: Column) -> Column:
    return b["block_type"] == RECTANGLE


def is_quadrilateral(b: Column) -> Column:
    return b["block_type"] == QUADRILATERAL


def px(b: Column, i: int) -> Column:
    """x coordinate of the i-th (0-based) quadrilateral corner; ``points``
    is the flat clockwise list of 8 (layout_elements.py:1142-1161)."""
    return F.element_at(b["points"], 2 * i + 1)


def py(b: Column, i: int) -> Column:
    return F.element_at(b["points"], 2 * i + 2)


def _q_min_x(b):
    return F.least(px(b, 0), px(b, 1), px(b, 2), px(b, 3))


def _q_max_x(b):
    return F.greatest(px(b, 0), px(b, 1), px(b, 2), px(b, 3))


def _q_min_y(b):
    return F.least(py(b, 0), py(b, 1), py(b, 2), py(b, 3))


def _q_max_y(b):
    return F.greatest(py(b, 0), py(b, 1), py(b, 2), py(b, 3))


def coord(b: Column, i: int) -> Column:
    """i-th component (0..3 = x_1,y_1,x_2,y_2) of ``coordinates(b)``."""
    return coords4(b)[i]


def coords4(b: Column):
    """Bounding 4-tuple (x_1, y_1, x_2, y_2) as FOUR separate scalar
    Columns.

    Interval: canvas promotion (layout_elements.py:147-163); Rectangle: its
    corners (:519-527); Quadrilateral: min/max bbox of the points
    (:864-874, utils.py:34-39).

    Library-internal code should use this rather than extracting fields
    from ``coordinates()``: field extraction from a built struct duplicates
    the whole struct subtree per reference when Spark expands the column
    DAG into an expression tree.
    """
    zero = F.lit(0.0)
    ix1 = F.when(b["axis"] == "x", b["start"]).otherwise(zero)
    iy1 = F.when(b["axis"] == "x", zero).otherwise(b["start"])
    ix2 = F.when(b["axis"] == "x", b["end"]).otherwise(b["canvas_width"])
    iy2 = F.when(b["axis"] == "x", b["canvas_height"]).otherwise(b["end"])
    x_1 = (
        F.when(is_interval(b), ix1)
        .when(is_rectangle(b), b["x_1"])
        .otherwise(_q_min_x(b))
    )
    y_1 = (
        F.when(is_interval(b), iy1)
        .when(is_rectangle(b), b["y_1"])
        .otherwise(_q_min_y(b))
    )
    x_2 = (
        F.when(is_interval(b), ix2)
        .when(is_rectangle(b), b["x_2"])
        .otherwise(_q_max_x(b))
    )
    y_2 = (
        F.when(is_interval(b), iy2)
        .when(is_rectangle(b), b["y_2"])
        .otherwise(_q_max_y(b))
    )
    return (x_1, y_1, x_2, y_2)


def coordinates(b: Column) -> Column:
    """``coordinates`` as a struct(x_1,y_1,x_2,y_2) — the user-facing form
    of ``coords4``."""
    x_1, y_1, x_2, y_2 = coords4(b)
    return F.struct(
        x_1.alias("x_1"), y_1.alias("y_1"), x_2.alias("x_2"), y_2.alias("y_2")
    )


def width(b: Column) -> Column:
    """layout_elements.py:133-145 (Interval), :509-517 (Rectangle),
    :851-862 (Quadrilateral: user value else bbox extent)."""
    return (
        F.when(
            is_interval(b),
            F.when(b["axis"] == "y", b["canvas_width"]).otherwise(
                b["end"] - b["start"]
            ),
        )
        .when(is_rectangle(b), b["x_2"] - b["x_1"])
        .otherwise(F.coalesce(b["width"], _q_max_x(b) - _q_min_x(b)))
    )


def height(b: Column) -> Column:
    """layout_elements.py:117-131 / :498-507 / :838-849."""
    return (
        F.when(
            is_interval(b),
            F.when(b["axis"] == "x", b["canvas_height"]).otherwise(
                b["end"] - b["start"]
            ),
        )
        .when(is_rectangle(b), b["y_2"] - b["y_1"])
        .otherwise(F.coalesce(b["height"], _q_max_y(b) - _q_min_y(b)))
    )


def _shoelace(b: Column) -> Column:
    """0.5*|Σ x_i·y_{i-1} − Σ y_i·x_{i-1}| for the 4 quad points —
    fixed-term expansion of ``polygon_area`` (elements/utils.py:69-82)."""
    x0, x1, x2, x3 = px(b, 0), px(b, 1), px(b, 2), px(b, 3)
    y0, y1, y2, y3 = py(b, 0), py(b, 1), py(b, 2), py(b, 3)
    s = (x0 * y3 + x1 * y0 + x2 * y1 + x3 * y2) - (
        y0 * x3 + y1 * x0 + y2 * x1 + y3 * x2
    )
    return 0.5 * F.abs(s)


def area(b: Column) -> Column:
    """Interval: width×height bounded to canvas (layout_elements.py:188-196);
    Rectangle: w×h (:556-559); Quadrilateral: shoelace (:899-904)."""
    return (
        F.when(is_interval(b), width(b) * height(b))
        .when(is_rectangle(b), width(b) * height(b))
        .otherwise(_shoelace(b))
    )


def center_x(b: Column) -> Column:
    """2-D center x.  Rectangle: midpoint (layout_elements.py:543-551);
    Quadrilateral: mean of the 4 points (:888-897).  NULL for intervals —
    the reference's ``Interval.center`` is the 1-D scalar
    (``interval_center``)."""
    return (
        F.when(is_rectangle(b), (b["x_1"] + b["x_2"]) / 2.0)
        .when(
            is_quadrilateral(b),
            (px(b, 0) + px(b, 1) + px(b, 2) + px(b, 3)) / 4.0,
        )
        .otherwise(F.lit(None).cast("double"))
    )


def center_y(b: Column) -> Column:
    return (
        F.when(is_rectangle(b), (b["y_1"] + b["y_2"]) / 2.0)
        .when(
            is_quadrilateral(b),
            (py(b, 0) + py(b, 1) + py(b, 2) + py(b, 3)) / 4.0,
        )
        .otherwise(F.lit(None).cast("double"))
    )


def interval_center(b: Column) -> Column:
    """``Interval.center`` — 1-D midpoint (layout_elements.py:177-186)."""
    return (b["start"] + b["end"]) / 2.0


def rect_points(b: Column) -> Column:
    """The 4 clockwise corner points of ANY block's bounding box, as the
    flat 8-array — ``cvt_coordinates_to_points`` (elements/utils.py:21-31):
    TL, TR, BR, BL.  For a quadrilateral this returns its own ``points``
    verbatim (layout_elements.py:888)."""
    x1, y1, x2, y2 = coords4(b)
    corner_pts = F.array(x1, y1, x2, y1, x2, y2, x1, y2)
    return F.when(is_quadrilateral(b), b["points"]).otherwise(corner_pts)


def zorder_key(x: "Column", y: "Column", bits: int = 16,
               x_max: float = 1000.0, y_max: float = 1000.0) -> "Column":
    """Z-order (Morton) locality key for two coordinates — the sort key
    that makes a multi-dimensional parquet layout prune on BOTH axes:
    writing geometry tables sorted by ``zorder_key(x_1, y_1)`` clusters
    spatially-near blocks into the same row groups, so min/max column
    stats prune 2-D range scans (the standard lakehouse z-order layout,
    here as a pure Column expression).

    Coordinates are quantized to ``bits`` levels over [0, x_max/y_max]
    (clamped), then bit-interleaved x→even positions, y→odd.  Integer
    arithmetic only — exact in any engine."""
    from pyspark.sql import functions as F

    qx = F.least(
        F.greatest((x / x_max * ((1 << bits) - 1)).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )
    qy = F.least(
        F.greatest((y / y_max * ((1 << bits) - 1)).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return key
