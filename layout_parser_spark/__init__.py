"""layout_parser_spark — a PySpark-native document-structure & main-content
extraction engine with the query/data-processing capabilities of
Layout-Parser/layout-parser, re-expressed Spark-first.

Layers:

* ``schema``      — the tagged-union TEXTBLOCK struct / LAYOUT model.
* ``functions``   — geometry as pure Column expressions (+ one perspective
                    pandas-UDF island).
* ``operators``   — collection ops on block arrays, grouping/CCA tools,
                    OCR-style text aggregation, dedup / similarity /
                    text-analysis operators for training-data pipelines.
* ``sources``     — synthetic Common-Crawl-style page generation, JSON/CSV
                    layout IO, PDF token source (gated).
* ``plans``       — the flagship extraction pipeline (segment → boilerplate
                    drop → XY-cut reading order → text assembly) and
                    checkpoint-manifest resume bookkeeping.
* ``streaming``   — Structured Streaming variant of the extraction job.
"""

__version__ = "0.1.0"

from . import schema  # noqa: F401
from .session import get_spark  # noqa: F401
