from . import (  # noqa: F401
    dedup,
    grouping,
    layout_ops,
    multimodal,
    ocr_agg,
    similarity,
    text_analysis,
)
