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


def gcca_apply(
    df: DataFrame,
    key_cols: List[str],
    scoring_func: Callable,
    id_col: str = "block_id",
    default_score_value: int = 0,
    x1="x_1", y1="y_1", x2="x_2", y2="y_2",
) -> DataFrame:
    """Distributed ``generalized_connected_component_analysis_1d``
    (reference shape_operations.py:25-77) with an ARBITRARY Python
    scoring function — the generic slot that ``detect_lines`` /
    ``detect_lines_distributed`` specialize.  ``gcca_1d``'s union-find
    runs over (x_1, y_1, x_2, y_2) tuples per document; embarrassingly
    parallel across documents.

    Shape: repartition by key, then ONE ``mapInPandas`` kernel per
    partition with a pandas groupby inside — not per-group
    ``applyInPandas``, whose per-group Arrow framing dominates when
    documents are small (measured ~2× on 1 500 ≈10-row groups).  Memory
    note: the kernel concatenates its whole partition into one frame,
    so partitions must fit executor memory — which key-hash
    repartitioning of bounded-size documents guarantees.

    Sequence order (hence the reference's first-appearance component
    order) is ascending ``id_col``.  Aggregation = union-reduce
    (min/max corners) + member count.

    Output: key_cols + (comp_id, x_1, y_1, x_2, y_2, n_blocks)."""
    # plan-build-time validation (a missing key_cols name would silently
    # drop from the schema string and fail as an opaque Arrow mismatch)
    fields = {f.name: f for f in df.schema}
    missing = [c for c in key_cols if c not in fields]
    if missing:
        raise ValueError(
            f"gcca_apply: key_cols {missing} not in input schema "
            f"(have: {sorted(fields)})"
        )
    ktypes = ", ".join(
        f"{c} {fields[c].dataType.simpleString()}" for c in key_cols
    )
    schema = (
        f"{ktypes}, comp_id int, x_1 double, y_1 double, "
        "x_2 double, y_2 double, n_blocks int"
    )
    out_cols = [
        *key_cols, "comp_id", "x_1", "y_1", "x_2", "y_2", "n_blocks",
    ]
    keys = list(key_cols)

    def gen(batches):
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        out = []
        for kv, g in pdf.groupby(keys, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            g = g.sort_values(id_col)
            boxes = list(zip(g[x1], g[y1], g[x2], g[y2]))
            comps = connected_components_1d(
                len(boxes),
                lambda i, j: scoring_func(boxes[i], boxes[j])
                != default_score_value,
            )
            for ci, comp in enumerate(comps):
                u = _union_boxes([boxes[i] for i in comp])
                out.append((*kv, ci, *u, len(comp)))
        yield pd.DataFrame(out, columns=out_cols)

    parted = df.select(
        *keys, id_col, x1, y1, x2, y2
    ).repartition(*[F.col(c) for c in keys])
    return parted.mapInPandas(gen, schema=schema)


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


def detect_lines_distributed(
    df: DataFrame,
    key_cols: List[str],
    id_col: str = "block_id",
    x_tolerance: float = 10,
    y_tolerance: float = 10,
    max_iter: int = 20,
    x1="x_1", y1="y_1", x2="x_2", y2="y_2",
) -> DataFrame:
    """Line detection for documents whose block count EXPLODES past the
    per-document-Python granularity (the SURVEY §2.5 scale variant):
    pure-relational connected components, never materializing the O(n²)
    score matrix.

    * candidate edges by y-banding: each block lands in grid bands
      ``floor(yc/eff_y_tol)`` and that+1, so any pair within the center-y
      tolerance shares a band — an equi-join on (doc, band), with the
      exact predicate (including the reference's tolerance SWAP,
      shape_operations.py:126-130) as the join filter;
    * components by min-label propagation with pointer doubling: labels
      start as the block id; each round every node takes the min label in
      its neighborhood and EDGES CONTRACT onto current labels, so chains
      collapse geometrically (O(log n) rounds in practice, ``max_iter``
      bound + early stop on a converged round);
    * aggregate per component = union-reduce (min/max corners) + count,
      line_id = rank of the component's first block id per document.

    Output: key_cols + (line_id, x_1, y_1, x_2, y_2, n_tokens) — the same
    contract as ``detect_lines``; equality with the per-document kernel is
    pinned by tests."""
    eff_y_tol, eff_x_tol = x_tolerance, y_tolerance  # reference swap
    keys = [F.col(c) for c in key_cols]

    base = df.select(
        *key_cols,
        F.col(id_col).alias("bid"),
        F.col(x1).alias("bx1"),
        F.col(y1).alias("by1"),
        F.col(x2).alias("bx2"),
        F.col(y2).alias("by2"),
        ((F.col(y1) + F.col(y2)) / 2.0).alias("yc"),
    )
    band = F.floor(F.col("yc") / F.lit(float(eff_y_tol))).cast("long")
    banded = base.select(
        *key_cols, "bid", "bx1", "by1", "bx2", "by2", "yc",
        F.explode(F.array(band, band + 1)).alias("_band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    join_cond = (F.col("a._band") == F.col("b._band")) & (
        F.col("a.bid") < F.col("b.bid")
    )
    for c in key_cols:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    close = (
        (F.abs(F.col("a.yc") - F.col("b.yc")) <= F.lit(float(eff_y_tol)))
        & (
            F.least(
                F.abs(F.col("a.bx1") - F.col("b.bx2")),
                F.abs(F.col("a.bx2") - F.col("b.bx1")),
            )
            <= F.lit(float(eff_x_tol))
        )
    )
    edges = (
        a.hint("MERGE")
        .join(b.hint("MERGE"), join_cond)
        .where(close)
        .select(
            *[F.col(f"a.{c}") for c in key_cols],
            F.col("a.bid").alias("u"),
            F.col("b.bid").alias("v"),
        )
        .dropDuplicates(key_cols + ["u", "v"])
    )

    # min-label propagation with contraction + pointer doubling.  The
    # plain one-hop variant moves a min label one edge per round (O(n)
    # rounds on a chain — useless); composing L := L∘L each round doubles
    # the propagation distance → O(log n) rounds.  Every round's outputs
    # are localCheckpoint'ed BEFORE reuse so the lineage (and scheduler
    # cost) stays constant per round.
    labels = base.select(*key_cols, F.col("bid"), F.col("bid").alias("lbl"))
    cur_edges = edges.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # 1-hop: neighborhood minimum (undirected)
        nbr = cur_edges.select(
            *key_cols, F.col("u").alias("bid"), F.col("v").alias("nl")
        ).unionByName(
            cur_edges.select(
                *key_cols, F.col("v").alias("bid"), F.col("u").alias("nl")
            )
        )
        new_labels = (
            labels.join(nbr, on=key_cols + ["bid"], how="left")
            .groupBy(*key_cols, "bid")
            .agg(F.least(F.min("lbl"), F.min("nl")).alias("lbl"))
        )
        # pointer doubling: lbl := lbl(lbl)
        ptr = new_labels.select(
            *key_cols, F.col("bid").alias("lbl"), F.col("lbl").alias("_l2")
        )
        new_labels = (
            new_labels.join(ptr, on=key_cols + ["lbl"], how="left")
            .select(
                *key_cols,
                "bid",
                F.coalesce(F.col("_l2"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        # contract edges onto the (checkpointed) labels
        lu = new_labels.select(
            *key_cols, F.col("bid").alias("u"), F.col("lbl").alias("lu")
        )
        lv = new_labels.select(
            *key_cols, F.col("bid").alias("v"), F.col("lbl").alias("lv")
        )
        contracted = (
            cur_edges.join(lu, on=key_cols + ["u"])
            .join(lv, on=key_cols + ["v"])
            .where(F.col("lu") != F.col("lv"))
            .select(
                *key_cols,
                F.least("lu", "lv").alias("u"),
                F.greatest("lu", "lv").alias("v"),
            )
            .dropDuplicates(key_cols + ["u", "v"])
            .localCheckpoint(eager=True)
        )
        remaining = contracted.count()  # driver scalar per round, by design
        labels = new_labels
        cur_edges = contracted
        if remaining == 0:
            break

    # resolve label chains by pointer jumping: a leaf's label may point at
    # a representative whose own label kept dropping during contraction —
    # substitute lbl := label(lbl) with doubling until fixpoint
    for _ in range(max_iter):
        ptr = labels.select(
            *key_cols, F.col("bid").alias("lbl"), F.col("lbl").alias("_lbl2")
        )
        jumped = (
            labels.join(ptr, on=key_cols + ["lbl"], how="left")
            .select(
                *key_cols,
                "bid",
                F.coalesce(F.col("_lbl2"), F.col("lbl")).alias("lbl"),
                (F.coalesce(F.col("_lbl2"), F.col("lbl")) != F.col("lbl"))
                .cast("int")
                .alias("_chg"),
            )
        )
        jumped = jumped.localCheckpoint(eager=True)
        changed = jumped.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = jumped.drop("_chg")
        if changed == 0:
            break

    joined = base.join(
        labels.select(*key_cols, "bid", "lbl"), on=key_cols + ["bid"]
    )
    comp = joined.groupBy(*key_cols, "lbl").agg(
        F.min("bx1").alias("x_1"),
        F.min("by1").alias("y_1"),
        F.max("bx2").alias("x_2"),
        F.max("by2").alias("y_2"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.min("bid").alias("_first"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy("_first")
    return (
        comp.withColumn("line_id", F.row_number().over(w) - 1)
        .select(
            *key_cols, "line_id", "x_1", "y_1", "x_2", "y_2",
            F.col("n_tokens").cast("int").alias("n_tokens"),
        )
    )


def gap_cluster_1d(center: "F.Column", key_cols: List[str], tol: float,
                   order_cols: List[str]):
    """1-D transitive proximity clustering as ONE window pass: sort by
    the center coordinate within each document and open a new cluster
    whenever the gap to the previous center exceeds ``tol``.  For 1-D
    centers this is EXACTLY the connected components of
    |c_i − c_j| ≤ tol (transitive chains split precisely at gaps), so
    no iterative propagation is needed — the window is the scalable
    shape (partitioned per document).  Returns the 0-based cluster id
    ordered by coordinate."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(center, *order_cols)
    prev = F.lag(center).over(w)
    is_new = F.when(
        prev.isNull() | (center - prev > F.lit(float(tol))), 1
    ).otherwise(0)
    return (
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1
    )


def detect_table_grid(
    df: DataFrame,
    key_cols: List[str],
    id_col: str = "block_id",
    x_tolerance: float = 10,
    y_tolerance: float = 10,
    x1="x_1", y1="y_1", x2="x_2", y2="y_2",
) -> DataFrame:
    """Table structure recovery from cell boxes: assign every cell a
    (row_id, col_id) grid position by clustering y-centers into rows and
    x-centers into columns (both via ``gap_cluster_1d``) — the
    two-axis composition of the §2.5 grouping family that turns a bag of
    detected cell rectangles into a rectangular grid (the precursor to
    CSV/HTML table serialization).

    Output: key_cols + (cell id, row_id, col_id, n_rows, n_cols).
    Two window passes per document, no joins, no iteration."""
    yc = (F.col(y1) + F.col(y2)) / 2.0
    xc = (F.col(x1) + F.col(x2)) / 2.0
    base = df.select(
        *key_cols,
        F.col(id_col).alias("cell_id"),
        xc.alias("_xc"),
        yc.alias("_yc"),
    )
    out = base.withColumn(
        "row_id",
        gap_cluster_1d(F.col("_yc"), key_cols, y_tolerance, ["cell_id"]),
    ).withColumn(
        "col_id",
        gap_cluster_1d(F.col("_xc"), key_cols, x_tolerance, ["cell_id"]),
    )
    from pyspark.sql.window import Window

    wdoc = Window.partitionBy(*key_cols)
    return out.select(
        *key_cols, "cell_id",
        F.col("row_id").cast("long").alias("row_id"),
        F.col("col_id").cast("long").alias("col_id"),
        (F.max("row_id").over(wdoc) + 1).cast("long").alias("n_rows"),
        (F.max("col_id").over(wdoc) + 1).cast("long").alias("n_cols"),
    )
