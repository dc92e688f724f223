"""Perspective transforms for Quadrilateral condition_on / relative_to —
the ONE geometry family that cannot be a closed-form Column expression
(SURVEY §2.2, "quad case → pandas UDF").

The reference computes a homography with cv2 (``Quadrilateral.
perspective_matrix``, layout_elements.py:907-931, and
``perspective_transformation``, elements/utils.py:42-54).  cv2 is not a
dependency here, so the 3×3 homography is solved directly as the standard
8×8 linear system (public textbook math — identical result to
``cv2.getPerspectiveTransform``).  All work is numpy-vectorized inside an
Arrow-batched pandas UDF; never per-row Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType
from pyspark.sql.functions import pandas_udf

__all__ = [
    "get_perspective_matrix",
    "perspective_transform_points",
    "transform_points_quad",
    "condition_on_quad",
    "relative_to_quad",
    "condition_on_any",
    "relative_to_any",
]


def get_perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography M with dst ~ M @ src (homogeneous), from 4 point
    pairs — equivalent to cv2.getPerspectiveTransform.  src/dst: (4,2)."""
    A = np.zeros((8, 8))
    rhs = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        rhs[2 * i] = u
        rhs[2 * i + 1] = v
    sol = np.linalg.solve(A, rhs)
    return np.append(sol, 1.0).reshape(3, 3)


def _mapped_rectangle_points(
    points: np.ndarray, width: float, height: float
) -> np.ndarray:
    """``Quadrilateral.mapped_rectangle_points`` (layout_elements.py:907-914):
    target rectangle corners assigned by each point's stable coordinate
    rank (``map_to_points_ordering``, :920-931)."""
    order = points.argsort(axis=0, kind="stable").argsort(
        axis=0, kind="stable"
    )
    x_map = np.array([0.0, 0.0, width, width])
    y_map = np.array([0.0, 0.0, height, height])
    return np.vstack([x_map[order[:, 0]], y_map[order[:, 1]]]).T


def perspective_transform_points(
    self_points: np.ndarray,
    other_points: np.ndarray,
    other_width: float,
    other_height: float,
    is_inv: bool,
) -> np.ndarray:
    """``perspective_transformation`` (elements/utils.py:42-54) applied with
    ``other``'s perspective matrix — the body of
    Quadrilateral.condition_on/relative_to (layout_elements.py:946-955,
    :972-979); is_inv=True ⇒ condition_on."""
    dst = _mapped_rectangle_points(other_points, other_width, other_height)
    M = get_perspective_matrix(other_points.astype("float64"), dst)
    if is_inv:
        M = np.linalg.inv(M)
    src_mid = np.hstack(
        [self_points, np.ones((self_points.shape[0], 1))]
    ).T
    dst_mid = M @ src_mid
    return (dst_mid / dst_mid[-1]).T[:, :2]


def _quad_width_height(pts: np.ndarray, w, h):
    """Quadrilateral.height/width: user value else bbox extent
    (layout_elements.py:838-862)."""
    if w is None or (isinstance(w, float) and np.isnan(w)):
        w = pts[:, 0].max() - pts[:, 0].min()
    if h is None or (isinstance(h, float) and np.isnan(h)):
        h = pts[:, 1].max() - pts[:, 1].min()
    return float(w), float(h)


def _make_transform_udf(is_inv: bool):
    @pandas_udf(ArrayType(DoubleType()))
    def _udf(
        self_points: pd.Series,
        other_points: pd.Series,
        other_width: pd.Series,
        other_height: pd.Series,
    ) -> pd.Series:
        out = []
        for sp, op, ow, oh in zip(
            self_points, other_points, other_width, other_height
        ):
            # Pandas-UDF branches inside when() may be evaluated for
            # non-matching rows — tolerate null points (non-quad rows).
            if sp is None or op is None:
                out.append(None)
                continue
            spts = np.asarray(sp, dtype="float64").reshape(4, 2)
            opts = np.asarray(op, dtype="float64").reshape(4, 2)
            ow2, oh2 = _quad_width_height(opts, ow, oh)
            res = perspective_transform_points(spts, opts, ow2, oh2, is_inv)
            out.append(res.reshape(-1).tolist())
        return pd.Series(out)

    return _udf


_condition_udf = None
_relative_udf = None


def transform_points_quad(
    self_points: Column,
    other_points: Column,
    other_width: Column,
    other_height: Column,
    is_inv: bool,
) -> Column:
    """Column wrapper: new flat 8-point array of ``self`` transformed by
    ``other``'s perspective matrix.  is_inv=True ⇒ condition_on semantics,
    False ⇒ relative_to."""
    global _condition_udf, _relative_udf
    if is_inv:
        if _condition_udf is None:
            _condition_udf = _make_transform_udf(True)
        u = _condition_udf
    else:
        if _relative_udf is None:
            _relative_udf = _make_transform_udf(False)
        u = _relative_udf
    return u(
        self_points,
        other_points,
        other_width.cast("double"),
        other_height.cast("double"),
    )


def _quad_case(b: Column, other: Column, is_inv: bool) -> Column:
    """condition_on/relative_to when ``other`` is a Quadrilateral
    (layout_elements.py:240-243 Interval → promote to quad first; :580-588
    Rectangle; :946-955 / :972-979 Quadrilateral): transform self's (corner)
    points by other's perspective matrix; the result is a Quadrilateral
    carrying self's height/width property values (:588, :955).

    Built scalar-leaf (no nested struct rebuilds) — see transforms._cond_rel.
    """
    from .. import schema as S
    from ..schema import QUADRILATERAL
    from .geometry import is_interval, is_quadrilateral, is_rectangle

    # other is a quadrilateral here: its height/width properties
    oxs = [F.element_at(other["points"], 2 * i + 1) for i in range(4)]
    oys = [F.element_at(other["points"], 2 * i + 2) for i in range(4)]
    oh = F.coalesce(other["height"], F.greatest(*oys) - F.least(*oys))
    ow = F.coalesce(other["width"], F.greatest(*oxs) - F.least(*oxs))

    bi, br, bq = is_interval(b), is_rectangle(b), is_quadrilateral(b)

    # bbox of self promoted onto other's canvas (Interval.put_on_canvas →
    # coordinates; Rectangle keeps its corners)
    bx1 = F.when(
        bi, F.when(b["axis"] == "x", b["start"]).otherwise(F.lit(0.0))
    ).otherwise(b["x_1"])
    by1 = F.when(
        bi, F.when(b["axis"] == "x", F.lit(0.0)).otherwise(b["start"])
    ).otherwise(b["y_1"])
    bx2 = F.when(
        bi, F.when(b["axis"] == "x", b["end"]).otherwise(ow)
    ).otherwise(b["x_2"])
    by2 = F.when(
        bi, F.when(b["axis"] == "x", oh).otherwise(b["end"])
    ).otherwise(b["y_2"])

    corner_x = [bx1, bx2, bx2, bx1]
    corner_y = [by1, by1, by2, by2]
    src_pts = []
    for i in range(4):
        src_pts.append(
            F.when(bq, F.element_at(b["points"], 2 * i + 1)).otherwise(
                corner_x[i]
            )
        )
        src_pts.append(
            F.when(bq, F.element_at(b["points"], 2 * i + 2)).otherwise(
                corner_y[i]
            )
        )

    # self.height/width property values (quad: user value else bbox extent;
    # promoted interval/rect: bbox extent)
    bxs = [F.element_at(b["points"], 2 * i + 1) for i in range(4)]
    bys = [F.element_at(b["points"], 2 * i + 2) for i in range(4)]
    src_h = F.when(
        bq, F.coalesce(b["height"], F.greatest(*bys) - F.least(*bys))
    ).otherwise(by2 - by1)
    src_w = F.when(
        bq, F.coalesce(b["width"], F.greatest(*bxs) - F.least(*bxs))
    ).otherwise(bx2 - bx1)

    new_pts = transform_points_quad(
        F.array(*src_pts), other["points"], ow, oh, is_inv
    )
    geom = S.make_block(
        block_type=QUADRILATERAL, points=new_pts, height=src_h, width=src_w
    )
    return S.with_meta(geom, b)


def condition_on_quad(b: Column, other: Column) -> Column:
    return _quad_case(b, other, True)


def relative_to_quad(b: Column, other: Column) -> Column:
    return _quad_case(b, other, False)


def condition_on_any(b: Column, other: Column) -> Column:
    """Full-dispatch condition_on: columnar fast path for interval/rectangle
    ``other``, perspective UDF for quadrilateral ``other``."""
    from .geometry import is_quadrilateral
    from .transforms import condition_on

    return F.when(
        is_quadrilateral(other), condition_on_quad(b, other)
    ).otherwise(condition_on(b, other))


def relative_to_any(b: Column, other: Column) -> Column:
    from .geometry import is_quadrilateral
    from .transforms import relative_to

    return F.when(
        is_quadrilateral(other), relative_to_quad(b, other)
    ).otherwise(relative_to(b, other))
