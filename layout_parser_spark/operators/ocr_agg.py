"""OCR-style text aggregation (SURVEY §2.7) — the text-assembly semantics
the engine must match byte-for-byte.

* ``gather_data`` — Tesseract TSV token table → per-group boxes+text
  (ocr/tesseract_agent.py:135-181): drop NaN-text rows; group by the level
  prefix of (page_num, block_num, par_num, line_num, word_num); per group
  x_1=min(left), y_1=min(top), w=max(width), h=max(height),
  score=mean(conf), text = ' '-join in ROW ORDER (pandas ``str.cat(sep='
  ')``); then x_2=x_1+w, y_2=y_1+h; id = positional index after the
  (key-sorted) groupby.
* ``gather_full_text`` — GCV recursive hierarchy (ocr/gcv_agent.py:205-274):
  symbols join with '' into words (:239-243), everything above joins with
  ' ' (:254).

Both are pure groupBy aggregations: partial+final hash agg, order pinned
via ``sort_array(collect_list(struct(pos, …)))`` — never Python.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: TesseractFeatureType group levels (ocr/tesseract_agent.py:51-54)
TESSERACT_LEVELS = {
    "page": ["page_num"],
    "block": ["page_num", "block_num"],
    "para": ["page_num", "block_num", "par_num"],
    "line": ["page_num", "block_num", "par_num", "line_num"],
    "word": ["page_num", "block_num", "par_num", "line_num", "word_num"],
}


def ordered_concat(text_col: str, pos_col: str, sep: str = " ") -> "Column":
    """Deterministic ordered string aggregation: sort_array over
    (pos, text) structs then concat — the shuffle-safe replacement for
    pandas' implicit row order."""
    return F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(pos_col), F.col(text_col)))
            ),
            lambda s: s[text_col],
        ),
        sep,
    )


def gather_data(
    tokens: DataFrame,
    group_cols: Sequence[str],
    *,
    left="left",
    top="top",
    width="width",
    height="height",
    conf="conf",
    text="text",
    pos="pos",
    id_partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Tesseract ``gather_data`` semantics over a token table.

    Output: group_cols + (id, x_1, y_1, x_2, y_2, score, text,
    block_type='rectangle').  ``id`` is the positional index in group-key
    order (pandas groupby sorts keys — reproduced with a window over the
    group keys; deterministic, no monotonically_increasing_id).

    Scale note: the reference assigns ids per IMAGE; pass the document key
    as ``id_partition_cols`` so the row_number window partitions by
    document instead of running unpartitioned (single-task) over the whole
    table."""
    g = (
        tokens.where(F.col(text).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.min(left).alias("x_1"),
            F.min(top).alias("y_1"),
            F.max(width).alias("_w"),
            F.max(height).alias("_h"),
            F.avg(conf).alias("score"),
            ordered_concat(text, pos, " ").alias("text"),
        )
    )
    order_cols = [c for c in group_cols if c not in set(id_partition_cols)]
    if id_partition_cols:
        w = Window.partitionBy(*id_partition_cols).orderBy(
            *[F.col(c) for c in order_cols]
        )
    else:
        w = Window.orderBy(*[F.col(c) for c in group_cols])
    return (
        g.withColumn("x_2", F.col("x_1") + F.col("_w"))
        .withColumn("y_2", F.col("y_1") + F.col("_h"))
        .withColumn("id", F.row_number().over(w) - 1)
        .withColumn("block_type", F.lit("rectangle"))
        .drop("_w", "_h")
    )


def gather_text_annotations(
    tokens: DataFrame,
    doc_cols: Sequence[str],
    *,
    vertices="vertices",
    text="text",
    pos="pos",
) -> DataFrame:
    """GCV ``gather_text_annotations`` (ocr/gcv_agent.py:181-203): one
    Quadrilateral TextBlock per token annotation — points straight from the
    4 vertices, id = enumeration order (per document, by ``pos``).

    ``vertices`` is an array<double> of 8 (flat clockwise), matching the
    protobuf vertex order."""
    from pyspark.sql import functions as F  # noqa: F811
    from ..schema import QUADRILATERAL, make_block

    w = Window.partitionBy(*doc_cols).orderBy(pos)
    blk = make_block(
        block_type=QUADRILATERAL,
        points=F.col(vertices),
        text=F.col(text),
        id=F.row_number().over(w) - 1,
    )
    return tokens.select(*doc_cols, blk.alias("block"))


def gather_full_text(
    symbols: DataFrame,
    doc_cols: Sequence[str],
    levels: Sequence[str],
    *,
    text="text",
    pos="pos",
) -> DataFrame:
    """GCV ``gather_full_text_annotation`` join cascade: the innermost level
    (symbols→words) joins with '' (gcv_agent.py:239-243), every level above
    joins with ' ' (:254).

    ``levels`` are the hierarchy columns from outer to inner, e.g.
    ``["block_num", "par_num", "word_num"]``: symbols group into words by
    all of them, words into paragraphs by the prefix, etc.  Returns one row
    per doc with the full text, plus intermediate level counts."""
    # symbols → words ('' join)
    word_keys = list(doc_cols) + list(levels)
    words = symbols.groupBy(*word_keys).agg(
        ordered_concat(text, pos, "").alias("text"),
        F.min(pos).alias("pos"),
    )
    cur = words
    # words → … → doc (' ' join), peeling one level per step
    for i in range(len(levels) - 1, -1, -1):
        keys = list(doc_cols) + list(levels[:i])
        cur = cur.groupBy(*keys).agg(
            ordered_concat("text", "pos", " ").alias("text"),
            F.min("pos").alias("pos"),
        )
    return cur.drop("pos")
