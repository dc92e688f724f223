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


def _batched_transform(
    spts: np.ndarray,
    opts: np.ndarray,
    ow: np.ndarray,
    oh: np.ndarray,
    is_inv: bool,
) -> np.ndarray:
    """Vectorized body of perspective_transform_points over a whole Arrow
    batch: (N,4,2) self/other point stacks → (N,4,2) transformed points.
    One stacked ``np.linalg.solve`` on (N,8,8) replaces N per-row solves —
    ~20× on 2k-row batches."""
    n = spts.shape[0]
    # width/height defaults: bbox extents where the property is NaN
    bw = opts[:, :, 0].max(axis=1) - opts[:, :, 0].min(axis=1)
    bh = opts[:, :, 1].max(axis=1) - opts[:, :, 1].min(axis=1)
    ow = np.where(np.isnan(ow), bw, ow)
    oh = np.where(np.isnan(oh), bh, oh)
    # mapped_rectangle_points (layout_elements.py:907-931): stable ranks
    rx = opts[:, :, 0].argsort(axis=1, kind="stable").argsort(
        axis=1, kind="stable"
    )
    ry = opts[:, :, 1].argsort(axis=1, kind="stable").argsort(
        axis=1, kind="stable"
    )
    dst = np.empty_like(opts)
    dst[:, :, 0] = np.where(rx <= 1, 0.0, ow[:, None])
    dst[:, :, 1] = np.where(ry <= 1, 0.0, oh[:, None])
    # stacked 8×8 systems
    A = np.zeros((n, 8, 8))
    rhs = np.zeros((n, 8))
    x, y = opts[:, :, 0], opts[:, :, 1]
    u, v = dst[:, :, 0], dst[:, :, 1]
    for i in range(4):
        A[:, 2 * i, 0] = x[:, i]
        A[:, 2 * i, 1] = y[:, i]
        A[:, 2 * i, 2] = 1.0
        A[:, 2 * i, 6] = -u[:, i] * x[:, i]
        A[:, 2 * i, 7] = -u[:, i] * y[:, i]
        A[:, 2 * i + 1, 3] = x[:, i]
        A[:, 2 * i + 1, 4] = y[:, i]
        A[:, 2 * i + 1, 5] = 1.0
        A[:, 2 * i + 1, 6] = -v[:, i] * x[:, i]
        A[:, 2 * i + 1, 7] = -v[:, i] * y[:, i]
        rhs[:, 2 * i] = u[:, i]
        rhs[:, 2 * i + 1] = v[:, i]
    M = np.empty((n, 3, 3))
    M[:, 2, 2] = 1.0
    sol = np.linalg.solve(A, rhs)  # raises LinAlgError on singular rows
    M[:, 0, :] = sol[:, 0:3]
    M[:, 1, :] = sol[:, 3:6]
    M[:, 2, 0:2] = sol[:, 6:8]
    if is_inv:
        M = np.linalg.inv(M)
    src_h = np.concatenate([spts, np.ones((n, 4, 1))], axis=2)  # (N,4,3)
    out_h = np.einsum("nij,nkj->nki", M, src_h)  # (N,4,3)
    return out_h[:, :, :2] / out_h[:, :, 2:3]


def _make_transform_udf(is_inv: bool):
    @pandas_udf(ArrayType(DoubleType()))
    def _udf(
        self_points: pd.Series,
        other_points: pd.Series,
        other_width: pd.Series,
        other_height: pd.Series,
    ) -> pd.Series:
        # Pandas-UDF branches inside when() may be evaluated for
        # non-matching rows — tolerate null points (non-quad rows).
        n = len(self_points)
        sp_arr = self_points.to_numpy(dtype="object")
        op_arr = other_points.to_numpy(dtype="object")
        valid = np.fromiter(
            (sp_arr[i] is not None and op_arr[i] is not None for i in range(n)),
            dtype=bool,
            count=n,
        )
        rows: list = [None] * n
        if valid.any():
            idx = np.flatnonzero(valid)
            # np.array over the list-of-arrays column is C-speed; the
            # per-row np.asarray comprehension this replaces was 10× the
            # batched solve itself
            spts = np.array(list(sp_arr[idx]), dtype="float64").reshape(
                -1, 4, 2
            )
            opts = np.array(list(op_arr[idx]), dtype="float64").reshape(
                -1, 4, 2
            )
            ow = other_width.to_numpy(dtype="float64", na_value=np.nan)[idx]
            oh = other_height.to_numpy(dtype="float64", na_value=np.nan)[idx]
            try:
                res = _batched_transform(spts, opts, ow, oh, is_inv)
                flat = res.reshape(len(idx), 8)
                res_rows = flat.tolist()
            except np.linalg.LinAlgError:
                # a singular (degenerate) quad poisons the stacked solve —
                # recover row-by-row on the scalar path
                res_rows = []
                for j in range(len(idx)):
                    ow2, oh2 = _quad_width_height(opts[j], ow[j], oh[j])
                    res_rows.append(
                        perspective_transform_points(
                            spts[j], opts[j], ow2, oh2, is_inv
                        ).reshape(-1).tolist()
                    )
            for j, i in enumerate(idx):
                rows[i] = res_rows[j]
        return pd.Series(rows, dtype="object")

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
