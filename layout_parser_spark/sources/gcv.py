"""GCV ``AnnotateImageResponse`` (de)serialization — SURVEY §2.7.

The reference round-trips Google-Cloud-Vision responses through
protobuf-JSON (``gcv_agent.py:276-288``: ``load_response`` =
``json_format.Parse``, ``save_response`` = ``MessageToJson``) and then
walks the object hierarchy in Python (``gcv_agent.py:181-274``).

Spark-first re-expression for a table of raw response JSON strings
(one per url, e.g. the OCR acquisition output of a 100 TB page corpus):

* ``parse_gcv_responses`` — JVM-side ``from_json`` against an explicit
  ``AnnotateImageResponse`` schema (the camelCase protobuf-JSON field
  names).  No Python touches a byte of the payload; the parse sits in
  the same whole-stage pipeline as the scan, so filters/pruning on
  sibling columns still push down.
* ``serialize_gcv_responses`` — ``to_json`` of the parsed struct.
  Spark's default ``ignoreNullFields`` drops NULL fields exactly like
  protobuf-JSON omits unset fields, so parse→serialize→parse is a
  fixed point (pinned in tests/test_gcv_source.py).
* ``gcv_annotation_tokens`` / ``gcv_symbol_tokens`` — posexplode
  cascades flattening the hierarchy into the token tables consumed by
  ``operators.ocr_agg.gather_text_annotations`` / ``gather_full_text``.
  Missing vertex coordinates decode as proto3 default 0, mirroring
  ``_cvt_GCV_vertices_to_points`` (``gcv_agent.py:33-34``) reading
  elided protobuf fields.

Scale shape: every stage is a narrow per-row transform except the
final ``pos`` numbering of ``gcv_symbol_tokens``, which windows per
DOCUMENT key (never a global window) — symbol counts per page are
bounded, so per-doc state is bounded.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

# --------------------------------------------------------------------------
# protobuf-JSON schema of AnnotateImageResponse (the subset layout-parser
# reads: textAnnotations + fullTextAnnotation; field names are the
# camelCase forms MessageToJson emits)
# --------------------------------------------------------------------------
VERTEX = StructType(
    [StructField("x", IntegerType()), StructField("y", IntegerType())]
)
BOUNDING_POLY = StructType([StructField("vertices", ArrayType(VERTEX))])
DETECTED_LANGUAGE = StructType(
    [
        StructField("languageCode", StringType()),
        StructField("confidence", DoubleType()),
    ]
)
DETECTED_BREAK = StructType(
    [StructField("type", StringType()), StructField("isPrefix", BooleanType())]
)
TEXT_PROPERTY = StructType(
    [
        StructField("detectedLanguages", ArrayType(DETECTED_LANGUAGE)),
        StructField("detectedBreak", DETECTED_BREAK),
    ]
)
SYMBOL = StructType(
    [
        StructField("property", TEXT_PROPERTY),
        StructField("boundingBox", BOUNDING_POLY),
        StructField("text", StringType()),
        StructField("confidence", DoubleType()),
    ]
)
WORD = StructType(
    [
        StructField("property", TEXT_PROPERTY),
        StructField("boundingBox", BOUNDING_POLY),
        StructField("symbols", ArrayType(SYMBOL)),
        StructField("confidence", DoubleType()),
    ]
)
PARAGRAPH = StructType(
    [
        StructField("property", TEXT_PROPERTY),
        StructField("boundingBox", BOUNDING_POLY),
        StructField("words", ArrayType(WORD)),
        StructField("confidence", DoubleType()),
    ]
)
BLOCK = StructType(
    [
        StructField("property", TEXT_PROPERTY),
        StructField("boundingBox", BOUNDING_POLY),
        StructField("paragraphs", ArrayType(PARAGRAPH)),
        StructField("blockType", StringType()),
        StructField("confidence", DoubleType()),
    ]
)
PAGE = StructType(
    [
        StructField("property", TEXT_PROPERTY),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("blocks", ArrayType(BLOCK)),
    ]
)
FULL_TEXT_ANNOTATION = StructType(
    [StructField("pages", ArrayType(PAGE)), StructField("text", StringType())]
)
TEXT_ANNOTATION = StructType(
    [
        StructField("locale", StringType()),
        StructField("description", StringType()),
        StructField("boundingPoly", BOUNDING_POLY),
    ]
)
GCV_RESPONSE = StructType(
    [
        StructField("textAnnotations", ArrayType(TEXT_ANNOTATION)),
        StructField("fullTextAnnotation", FULL_TEXT_ANNOTATION),
    ]
)


def parse_gcv_responses(
    df: DataFrame, json_col: str = "response", out_col: str = "gcv"
) -> DataFrame:
    """``load_response`` analogue (``gcv_agent.py:276-281``) over a whole
    table: parse the protobuf-JSON string column into a typed struct.
    Malformed rows yield a NULL struct (PERMISSIVE), never an error —
    per-row failure isolation for a web-scale corpus."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), GCV_RESPONSE))


def serialize_gcv_responses(
    df: DataFrame, parsed_col: str = "gcv", out_col: str = "response_json"
) -> DataFrame:
    """``save_response`` analogue (``gcv_agent.py:283-288``): re-emit
    protobuf-JSON.  NULL (unset) fields are omitted, like MessageToJson."""
    return df.withColumn(out_col, F.to_json(F.col(parsed_col)))


def _flat_points(vertices: Column) -> Column:
    """``_cvt_GCV_vertices_to_points`` (``gcv_agent.py:33-34``) as a flat
    clockwise array<double>; elided protobuf coords read as 0."""
    return F.flatten(
        F.transform(
            vertices,
            lambda v: F.array(
                F.coalesce(v["x"], F.lit(0)).cast("double"),
                F.coalesce(v["y"], F.lit(0)).cast("double"),
            ),
        )
    )


def gcv_annotation_tokens(
    df: DataFrame, doc_cols: Sequence[str], parsed_col: str = "gcv"
) -> DataFrame:
    """Token table for ``gather_text_annotations`` (``gcv_agent.py:181-203``):
    one row per text annotation SKIPPING the 0th whole-page entry, with
    ``pos`` = enumeration order and the flat 8-element vertex array."""
    # OUTER posexplode deliberately: a plain (inner) generate triggers
    # Catalyst's InferFiltersFromGenerate, which clones the generator
    # input into a pre-filter `size(...) > 0 AND isnotnull(...)` — and
    # when the annotations column is a from_json expression (the normal
    # case: parse_gcv_responses is lazy), the whole JSON parse evaluates
    # 3x per row.  The outer generate infers no filter (it preserves
    # rows); empty/NULL-annotation rows surface as one NULL row each and
    # die in the cheap post-generate `_i >= 1` attribute filter (NULL
    # comparisons are false).  Verified: one from_json per row in the
    # optimized plan vs three (tests/test_gcv_source.py plan pin).
    ann = F.posexplode_outer(F.col(parsed_col)["textAnnotations"])
    out = df.select(*doc_cols, ann.alias("_i", "_a")).where(F.col("_i") >= 1)
    return out.select(
        *doc_cols,
        (F.col("_i") - 1).alias("pos"),
        F.col("_a")["description"].alias("text"),
        _flat_points(F.col("_a")["boundingPoly"]["vertices"]).alias("vertices"),
        F.col("_a")["locale"].alias("locale"),
    )


def gcv_symbol_tokens(
    df: DataFrame, doc_cols: Sequence[str], parsed_col: str = "gcv"
) -> DataFrame:
    """Symbol table for ``gather_full_text`` (``gcv_agent.py:220-274``):
    posexplode cascade pages→blocks→paragraphs→words→symbols with the
    hierarchy indices ``(pi, bi, qi, wi, si)``, symbol text/confidence,
    the detectedBreak type, and a per-document ``pos`` in reading order
    (window partitioned by the document key — bounded per-doc state)."""
    # OUTER generates at every level for the same reason as
    # gcv_annotation_tokens: the inner form's inferred pre-filters clone
    # the generator input (a from_json expression at the first level,
    # re-collapsed projections below), multiplying the JSON-parse CPU.
    # NULL/empty levels propagate as single NULL rows and die in the one
    # cheap `si IS NOT NULL` attribute filter at the bottom.
    pg = df.select(
        *doc_cols,
        F.posexplode_outer(
            F.col(parsed_col)["fullTextAnnotation"]["pages"]
        ).alias("pi", "_pg"),
    )
    bl = pg.select(
        *doc_cols,
        "pi",
        F.posexplode_outer(F.col("_pg")["blocks"]).alias("bi", "_bl"),
    )
    pr = bl.select(
        *doc_cols,
        "pi",
        "bi",
        F.posexplode_outer(F.col("_bl")["paragraphs"]).alias("qi", "_pr"),
    )
    wd = pr.select(
        *doc_cols,
        "pi",
        "bi",
        "qi",
        F.posexplode_outer(F.col("_pr")["words"]).alias("wi", "_wd"),
    )
    sy = wd.select(
        *doc_cols,
        "pi",
        "bi",
        "qi",
        "wi",
        F.posexplode_outer(F.col("_wd")["symbols"]).alias("si", "_sy"),
    ).where(F.col("si").isNotNull())
    w = Window.partitionBy(*doc_cols).orderBy("pi", "bi", "qi", "wi", "si")
    return sy.select(
        *doc_cols,
        "pi",
        "bi",
        "qi",
        "wi",
        "si",
        F.col("_sy")["text"].alias("text"),
        F.col("_sy")["confidence"].alias("confidence"),
        F.col("_sy")["property"]["detectedBreak"]["type"].alias("break_type"),
    ).withColumn("pos", F.row_number().over(w) - 1)
