"""Columnar geometry function library (SURVEY §2.1–2.3).

Everything here is a pure Catalyst expression over the TEXTBLOCK tagged
union struct — JVM-side, codegen-friendly — except the perspective family
(``perspective.py``), which is a vectorized pandas UDF by necessity.
"""

from .geometry import (  # noqa: F401
    area,
    center_x,
    center_y,
    coord,
    coordinates,
    coords4,
    height,
    interval_center,
    is_interval,
    is_quadrilateral,
    is_rectangle,
    px,
    py,
    rect_points,
    width,
)
from .predicates import (  # noqa: F401
    InvalidShapeError,
    NotSupportedShapeError,
    intersect,
    is_in,
    union,
    vertice_in_polygon_expr,
)
from .transforms import (  # noqa: F401
    condition_on,
    pad,
    put_on_canvas,
    relative_to,
    scale,
    shift,
    to_interval,
    to_quadrilateral,
    to_rectangle,
)
