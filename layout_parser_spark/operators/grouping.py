"""Grouping / aggregation tools (SURVEY §2.5; reference
``tools/shape_operations.py``).

The reference's generalized 1-D connected-component analysis builds an
O(n²) pairwise score matrix and runs scipy ``connected_components``
(shape_operations.py:25-77).  The engine runs the SAME per-document
algorithm inside ``applyInPandas`` keyed by document — a graph op over
≤10³ blocks/doc is exactly the right granularity for a Python island, and
it is embarrassingly parallel across documents.  scipy is not a dependency:
an equivalent union-find produces identical components; component ORDER is
pinned to scipy's label order (first-appearance = ascending minimum member
index) and element order within a component is original sequence order.

Quirk replicated on purpose: ``simple_line_detection`` SWAPS the tolerance
kwargs at its call site — ``y_tolerance=x_tolerance, x_tolerance=
y_tolerance`` (shape_operations.py:126-130).  With both defaults = 10 the
swap is invisible; we pass it through verbatim for parity (compat flag).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_1d(
    n: int, edge_fn: Callable[[int, int], bool]
) -> List[List[int]]:
    """Union-find over the upper-triangle pairwise edges; returns components
    ordered by first appearance (ascending min index), members in original
    order — scipy-label-order compatible (shape_operations.py:63-77)."""
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if edge_fn(i, j):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    comps = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    return [comps[k] for k in sorted(comps, key=lambda r: min(comps[r]))]


def gcca_1d(
    sequence: Sequence,
    scoring_func: Callable,
    aggregation_func: Optional[Callable] = None,
    default_score_value: int = 0,
) -> list:
    """``generalized_connected_component_analysis_1d``
    (shape_operations.py:25-77) — local list form, used inside the
    applyInPandas kernels and directly by tests."""
    if aggregation_func is None:
        aggregation_func = lambda x: x  # noqa: E731 — identity, as reference
    comps = connected_components_1d(
        len(sequence),
        lambda i, j: scoring_func(sequence[i], sequence[j])
        != default_score_value,
    )
    return [aggregation_func([sequence[i] for i in comp]) for comp in comps]


def _union_boxes(boxes):
    """reduce-by-union over rectangle coord tuples
    (Rectangle.union, layout_elements.py:695-702)."""
    x1 = min(b[0] for b in boxes)
    y1 = min(b[1] for b in boxes)
    x2 = max(b[2] for b in boxes)
    y2 = max(b[3] for b in boxes)
    return (x1, y1, x2, y2)


def detect_lines_local(
    boxes: List[tuple], x_tolerance: float = 10, y_tolerance: float = 10
) -> List[tuple]:
    """``simple_line_detection`` (shape_operations.py:80-134) over rectangle
    coord tuples: same component iff |yc_a − yc_b| ≤ y_tol AND the
    horizontal gap min(|left_a − right_b|, |right_a − left_b|) ≤ x_tol
    (:110-124); aggregation = union-reduce (:131).

    The reference call site swaps the tolerances (:126-130); replicated:
    the effective y tolerance is ``x_tolerance`` and vice versa."""
    eff_y_tol, eff_x_tol = x_tolerance, y_tolerance  # the documented swap

    def close(a, b):
        ya = (a[1] + a[3]) / 2.0
        yb = (b[1] + b[3]) / 2.0
        return (
            abs(ya - yb) <= eff_y_tol
            and min(abs(a[0] - b[2]), abs(a[2] - b[0])) <= eff_x_tol
        )

    return gcca_1d(boxes, close, _union_boxes)


def detect_lines(
    df: DataFrame,
    key: str = "doc_id",
    blocks_col: str = "blocks",
    x_tolerance: float = 10,
    y_tolerance: float = 10,
) -> DataFrame:
    """Distributed line detection: per-document CCA via applyInPandas.
    Input: (key, blocks ARRAY<TEXTBLOCK> of rectangles).
    Output: (key, line_id, x_1, y_1, x_2, y_2, n_tokens)."""
    schema = (
        f"{key} long, line_id int, x_1 double, y_1 double, x_2 double, "
        "y_2 double, n_tokens int"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            boxes = [
                (b["x_1"], b["y_1"], b["x_2"], b["y_2"])
                for b in (row[blocks_col] or [])
            ]
            if not boxes:
                continue
            comps = connected_components_1d(
                len(boxes),
                lambda i, j: _line_close(
                    boxes[i], boxes[j], x_tolerance, y_tolerance
                ),
            )
            for li, comp in enumerate(comps):
                u = _union_boxes([boxes[i] for i in comp])
                out.append((row[key], li, *u, len(comp)))
        return pd.DataFrame(
            out,
            columns=[key, "line_id", "x_1", "y_1", "x_2", "y_2", "n_tokens"],
        )

    return df.groupBy(key).applyInPandas(
        lambda k, pdf: kernel(pdf), schema=schema
    )


def _line_close(a, b, x_tolerance, y_tolerance):
    eff_y_tol, eff_x_tol = x_tolerance, y_tolerance  # reference swap
    ya = (a[1] + a[3]) / 2.0
    yb = (b[1] + b[3]) / 2.0
    return (
        abs(ya - yb) <= eff_y_tol
        and min(abs(a[0] - b[2]), abs(a[2] - b[0])) <= eff_x_tol
    )


def group_blocks_by_category(
    df: DataFrame, key_cols: List[str], type_col: str, pos_col: str,
    x1="x_1", y1="y_1", x2="x_2", y2="y_2",
) -> DataFrame:
    """``group_textblocks_based_on_category`` (shape_operations.py:137-167)
    over the EXPLODED view, expressed relationally: equality scoring is
    transitive, so CCA degenerates to GROUP BY type with (a) union-reduce =
    min/max corner aggregation and (b) component order = first appearance =
    ``min(pos)`` — a two-phase hash aggregate, no Python.

    Output: key_cols + (type, x_1, y_1, x_2, y_2, n_blocks, group_order)."""
    agg = df.groupBy(*key_cols, type_col).agg(
        F.min(x1).alias("x_1"),
        F.min(y1).alias("y_1"),
        F.max(x2).alias("x_2"),
        F.max(y2).alias("y_2"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.min(pos_col).alias("_first_pos"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy("_first_pos")
    return agg.withColumn("group_order", F.row_number().over(w) - 1).drop(
        "_first_pos"
    )
