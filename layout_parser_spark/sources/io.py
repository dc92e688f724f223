"""Layout IO: the reference's JSON / CSV / dict (de)serialization surface
(SURVEY §2.6; reference ``io/basic.py``).

* JSON — the reference's ``to_dict``/``load_dict`` wire format maps 1:1
  onto the TEXTBLOCK struct (block feature sniffing is replaced by the
  fixed nullable schema): ``load_json_layouts`` reads files of
  ``{"page_data": …, "blocks": […]}`` documents; ``layout_to_json`` emits
  them, with NULL fields dropped exactly like the reference's sparse
  ``to_dict`` (elements/base.py:253-260).
* CSV — the reference's DataFrame form is one block per row with all
  feature columns and NaN for absent (``Layout.to_dataframe``,
  elements/layout.py:327-348): that is our EXPLODED view.  ``load_csv``
  parses ``points`` from its string form and auto-assigns ``id`` by file
  ROW ORDER when TextBlock features are present and id is absent
  (io/basic.py:143-147) — reproduced deterministically with a window over
  an explicit order column, never monotonically_increasing_id.
"""

from __future__ import annotations

import json
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType
from pyspark.sql.window import Window

from ..schema import FIELD_NAMES, LAYOUT, TEXTBLOCK, block_dict_to_row

#: TextBlock metadata features that trigger id auto-assignment
#: (io/basic.py:79-83, :143-147)
_TEXTBLOCK_FEATURES = ("text", "type", "parent", "next", "score")


def load_dict(d: dict) -> dict:
    """Reference ``load_dict`` for ONE layout dict → a LAYOUT row dict
    (io/basic.py:29-89): accepts a bare element dict, a list of element
    dicts, or {"page_data": …, "blocks": […]}."""
    def _page(p):
        if not p:
            return None
        return {
            "width": float(p["width"]) if p.get("width") is not None else None,
            "height": float(p["height"]) if p.get("height") is not None else None,
            "index": int(p["index"]) if p.get("index") is not None else None,
        }

    if isinstance(d, list):
        return {"page_data": None, "blocks": [block_dict_to_row(x) for x in d]}
    if "blocks" in d:
        return {
            "page_data": _page(d.get("page_data")),
            "blocks": [block_dict_to_row(x) for x in d["blocks"]],
        }
    return {"page_data": None, "blocks": [block_dict_to_row(d)]}


def load_json_layouts(
    spark: SparkSession, path: str, doc_id_col: str = "doc_id"
) -> DataFrame:
    """Read a JSON-lines file of layout documents into (doc_id, page_data,
    blocks) — ``spark.read.json`` with the explicit LAYOUT schema (no
    schema inference pass over the data)."""
    schema = f"{doc_id_col} long, page_data {LAYOUT['page_data'].dataType.simpleString()}, blocks {LAYOUT['blocks'].dataType.simpleString()}"
    return spark.read.json(path, schema=schema)


def layout_to_json(df: DataFrame, blocks_col: str = "blocks") -> DataFrame:
    """Serialize the layout columns to the reference JSON wire format:
    ``to_json`` drops NULL fields, matching sparse ``to_dict``."""
    return df.withColumn(
        "layout_json",
        F.to_json(
            F.struct(F.col("page_data"), F.col(blocks_col).alias("blocks")),
            {"ignoreNullFields": "true"},
        ),
    )


def from_json_layout(col) -> "Column":
    """Parse a layout JSON string column back into the LAYOUT struct."""
    return F.from_json(col, LAYOUT)


_CSV_NUMERIC = [
    "start", "end", "canvas_height", "canvas_width",
    "x_1", "y_1", "x_2", "y_2", "height", "width", "score",
]


def load_csv_blocks(
    spark: SparkSession,
    path: str,
    doc_id_col: Optional[str] = None,
) -> DataFrame:
    """Reference ``load_csv`` (io/basic.py:92-148): one block per row.

    ``points`` arrives as its Python-literal string form (parsed with
    ``from_json`` rather than ast.literal_eval); ``id`` is auto-assigned
    as the 0-based row index (per document if ``doc_id_col`` given) when
    any TextBlock feature is present and the id column is absent/null.

    Determinism: the read sets ``multiLine`` (which also parses quoted
    embedded newlines correctly), making each file non-splittable — so
    ``monotonically_increasing_id`` is a true within-file row order —
    and ids are dense row_numbers over (file path, file position):
    deterministic at ANY parallelism and for multi-file globs (files
    ordered lexicographically by path), not just single-file reads."""
    raw = spark.read.option("multiLine", "true").csv(path, header=True)
    cols = set(raw.columns)

    sel = []
    if doc_id_col and doc_id_col in cols:
        sel.append(F.col(doc_id_col))
    for name in FIELD_NAMES:
        if name == "points":
            if "points" in cols:
                # "[[1, 2], [3, 4], …]" nested or "[1,2,…]" flat — flatten
                parsed = F.from_json(F.col("points"), "array<array<double>>")
                flat = F.from_json(F.col("points"), "array<double>")
                sel.append(
                    F.coalesce(F.flatten(parsed), flat).alias("points")
                )
            else:
                sel.append(
                    F.lit(None).cast(ArrayType(DoubleType())).alias("points")
                )
        elif name in cols:
            f = TEXTBLOCK[name].dataType.simpleString()
            sel.append(F.col(name).cast(f).alias(name))
        else:
            f = TEXTBLOCK[name].dataType.simpleString()
            sel.append(F.lit(None).cast(f).alias(name))

    has_tb_features = any(f in cols for f in _TEXTBLOCK_FEATURES)
    df = raw.select(
        *sel,
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_file_pos"),
    )
    # (_file, _file_pos) is a deterministic total order: multiLine reads
    # are non-splittable, so _file_pos increases in row order within each
    # file (even when small files pack into one partition).
    if has_tb_features and ("id" not in cols):
        part = [doc_id_col] if (doc_id_col and doc_id_col in cols) else []
        w = (
            Window.partitionBy(*part).orderBy("_file", "_file_pos")
            if part
            else Window.orderBy("_file", "_file_pos")
        )
        df = df.withColumn("id", (F.row_number().over(w) - 1).cast("long"))
    return df.drop("_file", "_file_pos")


def blocks_to_exploded(df: DataFrame, blocks_col: str = "blocks") -> DataFrame:
    """nested → exploded CSV-shaped view (Layout.to_dataframe)."""
    ex = df.select(
        "*", F.posexplode(F.col(blocks_col)).alias("block_pos", "_b")
    ).drop(blocks_col)
    return ex.select(
        *[c for c in ex.columns if c != "_b"],
        *[F.col(f"_b.{n}").alias(n) for n in FIELD_NAMES],
    ).drop("_b")


def collect_exploded(
    df: DataFrame, key_cols: List[str], pos_col: str = "block_pos"
) -> DataFrame:
    """exploded → nested: collect blocks back into an array ordered by the
    position column (deterministic sort_array over (pos, struct))."""
    blk = F.struct(*[F.col(n).alias(n) for n in FIELD_NAMES])
    g = df.groupBy(*key_cols).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(pos_col).alias("p"), blk.alias("b")))
            ),
            lambda s: s["b"],
        ).alias("blocks")
    )
    return g
