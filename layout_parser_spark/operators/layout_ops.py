"""Collection operators on block arrays — the relational surface of
``Layout`` (SURVEY §2.4; reference ``elements/layout.py``).

A reference ``Layout`` is one row's ``blocks ARRAY<TEXTBLOCK>`` column here;
every Layout method maps to a higher-order-function expression (per-document,
no shuffle) or, for the cross-document "global" view, to ``posexplode`` +
relational ops.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import is_in
from ..functions.transforms import (
    condition_on,
    pad,
    relative_to,
    scale,
    shift,
    to_quadrilateral,
    to_rectangle,
)

__all__ = [
    "filter_by",
    "map_blocks",
    "shift_blocks",
    "pad_blocks",
    "scale_blocks",
    "condition_on_blocks",
    "relative_to_blocks",
    "is_in_blocks",
    "sort_blocks",
    "get_texts",
    "get_info",
    "concat_layouts",
    "slice_blocks",
    "block_at",
    "homogenize",
    "explode_blocks",
]


def filter_by(
    blocks: Column,
    other: Column,
    soft_margin: Optional[dict] = None,
    center: bool = False,
) -> Column:
    """``Layout.filter_by`` (layout.py:170-185): keep blocks contained in
    ``other``.  Per-document spatial semi-join as a filter() HOF; for a
    cross-document region set, explode + join on the same predicate with
    the region side broadcast."""
    return F.filter(
        blocks, lambda b: is_in(b, other, soft_margin=soft_margin, center=center)
    )


def map_blocks(blocks: Column, fn: Callable[[Column], Column]) -> Column:
    """Element-wise map — the engine form of Layout's mapped geometry ops
    (layout.py:126-140)."""
    return F.transform(blocks, fn)


def shift_blocks(blocks, dx, dy=None):
    return map_blocks(blocks, lambda b: shift(b, dx, dy))


def pad_blocks(blocks, **kw):
    return map_blocks(blocks, lambda b: pad(b, **kw))


def scale_blocks(blocks, fx, fy=None):
    return map_blocks(blocks, lambda b: scale(b, fx, fy))


def condition_on_blocks(blocks, other):
    return map_blocks(blocks, lambda b: condition_on(b, other))


def relative_to_blocks(blocks, other):
    return map_blocks(blocks, lambda b: relative_to(b, other))


def is_in_blocks(blocks, other, soft_margin=None, center=False):
    """``Layout.is_in`` — per-block boolean array (layout.py:187-200)."""
    return map_blocks(
        blocks, lambda b: is_in(b, other, soft_margin=soft_margin, center=center)
    )


def sort_blocks(
    blocks: Column, key: Callable[[Column], Column], reverse: bool = False
) -> Column:
    """``Layout.sort(key=…, reverse=…)`` (layout.py:142-168): stable sort of
    the block array by an arbitrary scalar key expression.

    Stability is guaranteed the same way the reference's ``sorted`` is: the
    comparator only distinguishes by key, and Spark's array_sort is a
    stable merge for equal comparator results."""
    lo, hi = (1, -1) if reverse else (-1, 1)

    def cmp(a, b):
        ka, kb = key(a), key(b)
        return F.when(ka < kb, lo).when(ka > kb, hi).otherwise(0)

    return F.array_sort(blocks, cmp)


def get_texts(blocks: Column) -> Column:
    """``Layout.get_texts`` (layout.py:244-252): texts of blocks that have
    one — the text-concatenation source for extraction."""
    return F.filter(
        F.transform(blocks, lambda b: b["text"]), lambda t: t.isNotNull()
    )


def get_info(blocks: Column, attr: str) -> Column:
    """``Layout.get_info(attr)`` (layout.py:254-265)."""
    return F.transform(blocks, lambda b: b[attr])


def concat_layouts(a: Column, b: Column) -> Column:
    """``Layout.__add__`` (layout.py:98-118) — per-document concat; the
    cross-document analogue is ``unionByName``."""
    return F.concat(a, b)


def slice_blocks(blocks: Column, start: int, length: int) -> Column:
    """list slicing (layout.py:68-96); 0-based start."""
    return F.slice(blocks, start + 1, length)


def block_at(blocks: Column, i: int) -> Column:
    """list indexing incl. Python negative indices (layout.py:68-96);
    Spark element_at is 1-based from the front and -1-based from the
    back, so 0-based ``i`` maps to ``i+1`` only when non-negative."""
    return F.element_at(blocks, i + 1 if i >= 0 else i)


def homogenize(blocks: Column) -> Column:
    """``Layout.get_homogeneous_blocks`` (layout.py:277-325): cast every
    block up to the maximum lattice type present
    (interval < rectangle < quadrilateral)."""
    rank = F.aggregate(
        blocks,
        F.lit(0),
        lambda acc, b: F.greatest(
            acc,
            F.when(b["block_type"] == "interval", F.lit(0))
            .when(b["block_type"] == "rectangle", F.lit(1))
            .otherwise(F.lit(2)),
        ),
    )
    return (
        F.when(rank == 2, F.transform(blocks, to_quadrilateral))
        .when(rank == 1, F.transform(blocks, to_rectangle))
        .otherwise(blocks)
    )


def explode_blocks(df: DataFrame, blocks_col: str = "blocks") -> DataFrame:
    """The 'exploded' relational view — one row per block with its position
    (``Layout.to_dataframe``, layout.py:327-348): SELECT …, posexplode."""
    return df.select(
        "*", F.posexplode(F.col(blocks_col)).alias("block_pos", "block")
    ).drop(blocks_col)
