"""Layout-model registry: ``lp://`` config URIs, label maps, and the
segmentation-backend routing (SURVEY §2.8).

The reference exposes three DL detection backends behind
``AutoLayoutModel('lp://<backend>/<dataset>/<arch>/<config|weight>')``
(models/auto_layoutmodel.py:61-116, models/model_config.py:41-133) whose
output contract is always ``Layout[TextBlock(Rectangle, type=label_map[c],
score)]``.  This engine keeps the same URI scheme and label maps, but a
"model" resolves to a SEGMENTATION BACKEND: a callable
``DataFrame(pages) → DataFrame(+page_data, blocks)`` honoring the same
output contract.  The deterministic DOM backend ships by default; a DL
backend would drop in as another mapInArrow stage without touching the
pipeline.

Backend-specific score-threshold semantics replicated:

* effdet keeps detections with score ≥ 0.25, and because its scores come
  sorted descending it early-breaks (models/effdet/layoutmodel.py:231-234)
  — columnar: filter + the sort is irrelevant to the surviving set.
* paddle keeps score > 0.5 AND class id > -1
  (models/paddledetection/layoutmodel.py:245-246).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: PubLayNet label map (models/detectron2/catalog.py:19-112 'label_map')
PUBLAYNET_LABELS = {0: "Text", 1: "Title", 2: "List", 3: "Table", 4: "Figure"}
#: PrimaLayout label map
PRIMA_LABELS = {
    1: "TextRegion", 2: "ImageRegion", 3: "TableRegion",
    4: "MathsRegion", 5: "SeparatorRegion", 6: "OtherRegion",
}
#: TableBank
TABLEBANK_LABELS = {0: "Table"}
#: HJDataset
HJ_LABELS = {
    1: "Page Frame", 2: "Row", 3: "Title Region",
    4: "Text Region", 5: "Title", 6: "Subtitle", 7: "Other",
}

LABEL_MAPS = {
    "publaynet": PUBLAYNET_LABELS,
    "prima": PRIMA_LABELS,
    "tablebank": TABLEBANK_LABELS,
    "hjdataset": HJ_LABELS,
}

#: per-backend default score thresholds (see module doc)
SCORE_THRESHOLDS = {"effdet": 0.25, "paddledetection": 0.5, "detectron2": None, "dom": None}


@dataclass
class ModelConfig:
    """Parsed ``lp://[backend/]dataset/arch/<config|weight>`` URI
    (models/model_config.py:41-133)."""

    backend: Optional[str]
    dataset: str
    arch: str
    leaf: str

    @property
    def label_map(self) -> Optional[dict]:
        return LABEL_MAPS.get(self.dataset.lower())

    @property
    def score_threshold(self) -> Optional[float]:
        return SCORE_THRESHOLDS.get(self.backend or "", None)


KNOWN_BACKENDS = ("detectron2", "effdet", "paddledetection", "dom")


def parse_model_config(uri: str) -> ModelConfig:
    """``lp://<backend>/<dataset>/<arch>/<config|weight>`` with the
    backend segment optional (the reference infers it from catalogs when
    omitted; we default to 'dom', the deterministic backend)."""
    if not uri.startswith("lp://"):
        raise ValueError(f"not an lp:// model config URI: {uri}")
    parts = [p for p in uri[len("lp://") :].split("/") if p]
    if len(parts) < 2:
        raise ValueError(f"malformed lp:// URI: {uri}")
    if parts[0].lower() in KNOWN_BACKENDS:
        backend, rest = parts[0].lower(), parts[1:]
    else:
        backend, rest = "dom", parts
    dataset = rest[0]
    arch = rest[1] if len(rest) > 2 else (rest[1] if len(rest) > 1 else "")
    leaf = rest[-1] if len(rest) > 1 else "config"
    return ModelConfig(backend=backend, dataset=dataset, arch=arch, leaf=leaf)


def apply_score_threshold(
    blocks: Column, threshold: Optional[float]
) -> Column:
    """The backend score cutoffs as a columnar filter; the effdet
    'early break on descending scores' (effdet/layoutmodel.py:231-234) is
    set-equivalent to the filter."""
    if threshold is None:
        return blocks
    return F.filter(blocks, lambda b: b["score"] >= threshold)


BackendFn = Callable[[DataFrame], DataFrame]

_BACKENDS: Dict[str, BackendFn] = {}


def register_backend(name: str, fn: BackendFn) -> None:
    _BACKENDS[name.lower()] = fn


def _dom_backend(pages: DataFrame) -> DataFrame:
    from .plans.segment import segment_pages

    return segment_pages(pages)


register_backend("dom", _dom_backend)


def auto_layout_model(config_uri: str) -> BackendFn:
    """``AutoLayoutModel`` routing (models/auto_layoutmodel.py:91-116):
    resolve the backend callable for a config URI; unknown DL backends
    raise (their native predictors are out of scope for this engine —
    registering a mapInArrow inference stage under the same name slots
    straight in)."""
    cfg = parse_model_config(config_uri)
    fn = _BACKENDS.get(cfg.backend or "dom")
    if fn is None:
        raise NotImplementedError(
            f"backend {cfg.backend!r} has no registered segmentation stage; "
            f"register one with register_backend({cfg.backend!r}, fn)"
        )
    thr = cfg.score_threshold
    if thr is None:
        return fn

    def wrapped(pages: DataFrame) -> DataFrame:
        out = fn(pages)
        return out.withColumn(
            "blocks", apply_score_threshold(F.col("blocks"), thr)
        )

    return wrapped
