"""Page segmentation: html BINARY → LAYOUT struct (page_data + blocks).

This is UDF slot #1 of the engine (SURVEY §2.11): the Spark re-expression of
the reference's detection backends — ``Detectron2LayoutModel.detect`` etc.
(models/detectron2/layoutmodel.py:121-168) all return
``Layout[TextBlock(Rectangle, type=label, score)]`` from an image.  Here the
"detector" is a deterministic DOM walk over the html payload (the graft
replaces DL inference with DOM+layout segmentation, same output contract):
every element carrying a ``data-box`` attribute becomes one TEXTBLOCK with

* rectangle coords from the attribute,
* ``type`` from the tag (header→Header, nav→Nav, footer→Footer,
  aside→Aside, figure→Figure, h1/h2/h3→Title, table→Table, li/ul→List,
  else Text) — the analogue of the reference's ``label_map`` application
  (models/detectron2/layoutmodel.py:137-141),
* ``text`` = whitespace-normalized own text (excluding nested data-box
  children),
* ``score`` = 1 − link_density (fraction of text characters inside <a>),
  i.e. a content-confidence score in the detector-score slot,
* ``id`` = document-order index, ``parent`` = enclosing data-box block id.

Arrow-batched pandas UDF (per-row python inside an Arrow batch — the
sanctioned vectorized pattern; never a row-at-a-time Spark UDF).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StructField, StructType

from ..schema import FIELD_NAMES, LAYOUT, TEXTBLOCK

TAG_TYPE = {
    "header": "Header",
    "footer": "Footer",
    "nav": "Nav",
    "aside": "Aside",
    "figure": "Figure",
    "h1": "Title",
    "h2": "Title",
    "h3": "Title",
    "table": "Table",
    "ul": "List",
    "li": "List",
}

#: types that the boilerplate stage drops outright
BOILERPLATE_TYPES = ("Header", "Footer", "Nav", "Aside")


class _Block:
    __slots__ = ("box", "type", "parent", "chunks", "link_chars", "order")

    def __init__(self, box, type_, parent, order):
        self.box = box
        self.type = type_
        self.parent = parent
        self.order = order
        self.chunks: List[str] = []
        self.link_chars = 0


class _SegmentParser(HTMLParser):
    """Collect data-box elements; text accrues to the NEAREST enclosing
    data-box element; anchor text counts toward link density."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.page_w: Optional[float] = None
        self.page_h: Optional[float] = None
        self.blocks: List[_Block] = []
        self._stack: List[int] = []  # indices into self.blocks
        self._a_depth = 0

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "html":
            self.page_w = float(d.get("data-w") or 0)
            self.page_h = float(d.get("data-h") or 0)
            return
        if tag == "a":
            self._a_depth += 1
        box = d.get("data-box")
        if box is not None:
            coords = tuple(float(v) for v in box.split(","))
            parent = self._stack[-1] if self._stack else None
            blk = _Block(coords, TAG_TYPE.get(tag, "Text"), parent,
                         len(self.blocks))
            self.blocks.append(blk)
            self._stack.append(blk.order)

    def handle_endtag(self, tag):
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
            return
        # close the innermost open data-box element for structural tags
        if self._stack and tag in (
            "p", "div", "header", "footer", "nav", "aside", "figure",
            "h1", "h2", "h3", "table", "ul", "li", "span",
        ):
            self._stack.pop()

    def handle_data(self, data):
        if not self._stack:
            return
        blk = self.blocks[self._stack[-1]]
        blk.chunks.append(data)
        if self._a_depth > 0:
            blk.link_chars += len(data)


def parse_page(html: str):
    """Parse one page → (page_w, page_h, [block rows])."""
    p = _SegmentParser()
    p.feed(html)
    rows = []
    for blk in p.blocks:
        raw = "".join(blk.chunks)
        text = " ".join(raw.split())
        total = len(raw.strip())
        link_density = (blk.link_chars / total) if total else 0.0
        x1, y1, x2, y2 = blk.box
        row = {n: None for n in FIELD_NAMES}
        row.update(
            block_type="rectangle",
            x_1=x1,
            y_1=y1,
            x_2=x2,
            y_2=y2,
            text=text,
            id=blk.order,
            type=blk.type,
            parent=blk.parent,
            score=1.0 - link_density,
        )
        rows.append(row)
    return p.page_w, p.page_h, rows


@pandas_udf(LAYOUT)
def segment_html(html: pd.Series) -> pd.DataFrame:
    """Scalar pandas-UDF form: html → LAYOUT struct.  Prefer
    ``segment_pages`` (mapInPandas) inside pipelines — see its docstring."""
    pages = []
    blocks = []
    for payload in html:
        if payload is None:
            pages.append(None)
            blocks.append([])
            continue
        if isinstance(payload, (bytes, bytearray)):
            payload = payload.decode("utf-8", errors="replace")
        w, h, rows = parse_page(payload)
        pages.append({"width": w, "height": h, "index": 0})
        blocks.append(rows)
    return pd.DataFrame({"page_data": pages, "blocks": blocks})


def segment_pages(pages_df, html_col: str = "html") -> "DataFrame":
    """pages(url, …, html) → (all columns except html) + (page_data,
    blocks).  One narrow Arrow stage (mapInPandas), no shuffle.

    Implemented as ``mapInPandas`` rather than a scalar struct-returning
    pandas UDF for two reasons: (1) the fat ``html`` payload column is
    dropped AT the Arrow boundary instead of being carried through the
    plan; (2) the stage output is a fresh set of plain attributes, so
    downstream higher-order expressions + the XY-cut UDF never end up with
    this UDF embedded in their argument trees (Spark's Python-UDF
    extraction mishandles chained UDFs through nested lambdas —
    'Cannot evaluate expression' — when projections collapse)."""
    passthrough = [f for f in pages_df.schema.fields if f.name != html_col]
    out_schema = StructType(
        passthrough
        + [
            StructField("page_data", LAYOUT["page_data"].dataType, True),
            StructField("blocks", LAYOUT["blocks"].dataType, True),
        ]
    )
    names = [f.name for f in passthrough]

    def gen(batches):
        for pdf in batches:
            pages = []
            blocks = []
            for payload in pdf[html_col]:
                if payload is None:
                    pages.append(None)
                    blocks.append([])
                    continue
                if isinstance(payload, (bytes, bytearray)):
                    payload = payload.decode("utf-8", errors="replace")
                w, h, rows = parse_page(payload)
                pages.append({"width": w, "height": h, "index": 0})
                blocks.append(rows)
            out = pdf[names].copy()
            out["page_data"] = pages
            out["blocks"] = blocks
            yield out

    return pages_df.mapInPandas(gen, schema=out_schema)
