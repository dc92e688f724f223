"""DL-backend contract: a third-party inference stage registered via
``register_backend`` slots into ``auto_layout_model('lp://<backend>/…')``
unchanged and honors the reference output contract
``Layout[TextBlock(Rectangle, type=label_map[c], score)]``.

Native detectron2/effdet/paddle predictors are out of sandbox scope (no
torch/paddle), so the backend here is a FAKE that replays the raw output
a detectron2 predictor produced on the reference's own golden image —
``/root/reference/tests/fixtures/model/layout_detection_reference.json``
(the fixture reference tests/test_model.py:102-118 pins its model
against).  The fake consumes (boxes, class_ids, scores) — exactly the
tensors detectron2's ``gather_output`` reads
(models/detectron2/layoutmodel.py:121-168) — and maps class ids through
the catalog label map, proving the registry + label-map + threshold +
Layout-schema plumbing end-to-end over a distributed pages table.
"""

import json

import pandas as pd
import pytest

from layout_parser_spark.models import (
    LABEL_MAPS,
    _BACKENDS,
    auto_layout_model,
    register_backend,
)
from layout_parser_spark.schema import FIELD_NAMES, LAYOUT, PAGE_DATA

FIXTURE = "/root/reference/tests/fixtures/model/layout_detection_reference.json"

#: inverse PubLayNet map: the fixture stores label strings; the fake
#: backend must receive raw class ids (what a predictor emits) and map
#: them forward itself.
_INV_PUBLAYNET = {v: k for k, v in LABEL_MAPS["publaynet"].items()}


def _golden_raw():
    """Fixture blocks → (boxes, class_ids, scores) raw predictor output."""
    with open(FIXTURE) as f:
        ref = json.load(f)
    boxes, classes, scores = [], [], []
    for b in ref["blocks"]:
        boxes.append((b["x_1"], b["y_1"], b["x_2"], b["y_2"]))
        classes.append(_INV_PUBLAYNET[b["type"]])
        scores.append(b["score"])
    return ref, boxes, classes, scores


def _make_fake_backend(boxes, classes, scores, label_map):
    """A mapInPandas inference stage with the segmentation-backend
    signature: pages(url, …, html) → (url, page_data, blocks)."""
    from pyspark.sql.types import StructField, StructType

    def backend(pages_df):
        key_field = pages_df.schema["url"]
        schema = StructType(
            [
                key_field,
                StructField("page_data", PAGE_DATA, True),
                StructField("blocks", LAYOUT["blocks"].dataType, True),
            ]
        )

        def gen(batches):
            for pdf in batches:
                recs = []
                for _, row in pdf.iterrows():
                    blocks = []
                    for i, ((x1, y1, x2, y2), c, s) in enumerate(
                        zip(boxes, classes, scores)
                    ):
                        blk = {n: None for n in FIELD_NAMES}
                        blk.update(
                            block_type="rectangle",
                            x_1=x1, y_1=y1, x_2=x2, y_2=y2,
                            id=i, type=label_map[c], score=s,
                        )
                        blocks.append(blk)
                    recs.append(
                        (row["url"], {"width": None, "height": None,
                                      "index": 0}, blocks)
                    )
                yield pd.DataFrame(
                    recs, columns=["url", "page_data", "blocks"]
                )

        return pages_df.mapInPandas(gen, schema=schema)

    return backend


@pytest.fixture()
def pages(spark):
    return spark.createDataFrame(
        [("http://a", "<p>x</p>"), ("http://b", "<p>y</p>")],
        "url string, html string",
    )


def test_registered_backend_replays_reference_golden(spark, pages):
    ref, boxes, classes, scores = _golden_raw()
    register_backend(
        "detectron2",
        _make_fake_backend(boxes, classes, scores, LABEL_MAPS["publaynet"]),
    )
    try:
        model = auto_layout_model(
            "lp://detectron2/publaynet/faster_rcnn_R_50_FPN_3x/config"
        )
        out = model(pages).orderBy("url").collect()
    finally:
        del _BACKENDS["detectron2"]

    assert [r.url for r in out] == ["http://a", "http://b"]
    for r in out:
        got = [
            {
                "x_1": b.x_1, "y_1": b.y_1, "x_2": b.x_2, "y_2": b.y_2,
                "block_type": b.block_type, "type": b.type,
                "score": b.score,
            }
            for b in r.blocks
        ]
        # float64 round-trip through Arrow + struct assembly is exact
        assert got == [
            {k: blk[k] for k in ("x_1", "y_1", "x_2", "y_2",
                                 "block_type", "type", "score")}
            for blk in ref["blocks"]
        ]
        # ids assigned in detection order, geometry is Rectangle
        assert [b.id for b in r.blocks] == list(range(len(ref["blocks"])))


def test_registered_backend_score_threshold_applied(spark, pages):
    """The effdet slot (threshold 0.25) filters the backend's raw
    detections inside the auto_layout_model wrapper — the backend itself
    stays threshold-free, matching effdet/layoutmodel.py:231-234."""
    _, boxes, classes, scores = _golden_raw()
    boxes = boxes + [(0.0, 0.0, 1.0, 1.0)]
    classes = classes + [0]
    scores = scores + [0.1]  # below the 0.25 effdet cutoff
    register_backend(
        "effdet",
        _make_fake_backend(boxes, classes, scores, LABEL_MAPS["publaynet"]),
    )
    try:
        model = auto_layout_model("lp://effdet/publaynet/tf_efficientdet_d0/config")
        out = model(pages).collect()
    finally:
        del _BACKENDS["effdet"]
    n_ref = len(boxes) - 1
    for r in out:
        assert len(r.blocks) == n_ref  # the 0.1-score detection is gone
        assert all(b.score >= 0.25 for b in r.blocks)


def _second_golden():
    """Second golden fixture, derived deterministically from the
    reference one: the same geometry/classes plus four extra detections,
    re-scored onto a strictly descending ramp 0.95→0.05 that straddles
    BOTH backend cutoffs (effdet 0.25, paddle 0.5) — so each threshold
    has genuine sub-threshold rows to drop, unlike the primary fixture
    (whose scores all clear 0.25)."""
    _, boxes, classes, _ = _golden_raw()
    boxes = boxes + [
        (10.0 * i, 5.0, 10.0 * i + 8.0, 12.0) for i in range(4)
    ]
    classes = classes + [i % 5 for i in range(4)]  # touch all 5 labels
    n = len(boxes)
    scores = [round(0.95 - 0.9 * i / (n - 1), 6) for i in range(n)]
    return boxes, classes, scores


def _reference_early_stop(boxes, classes, scores, thr, label_map):
    """Direct port of the effdet consume loop
    (models/effdet/layoutmodel.py:225-240): walk detections in emitted
    (descending-score) order, BREAK at the first score below the
    threshold."""
    kept = []
    for (x1, y1, x2, y2), c, s in zip(boxes, classes, scores):
        if s < thr:
            break
        kept.append((x1, y1, x2, y2, label_map[c], s))
    return kept


@pytest.mark.parametrize(
    "backend,uri,thr",
    [
        ("effdet", "lp://effdet/publaynet/tf_efficientdet_d0/config", 0.25),
        (
            "paddledetection",
            "lp://paddledetection/publaynet/ppyolov2_r50vd/config",
            0.5,
        ),
    ],
)
def test_threshold_early_stop_set_equivalence(spark, pages, backend, uri, thr):
    """apply_score_threshold's set-equivalence claim (models.py:99-107)
    pinned against the reference early-stop loop on a fixture that
    actually HAS sub-threshold rows: the engine's columnar filter and
    the reference's descending-order break keep the identical set, and
    the label map survives through both."""
    boxes, classes, scores = _second_golden()
    assert min(scores) < thr < max(scores)  # the cutoff really bites
    label_map = LABEL_MAPS["publaynet"]
    register_backend(
        backend, _make_fake_backend(boxes, classes, scores, label_map)
    )
    try:
        out = auto_layout_model(uri)(pages).collect()
    finally:
        del _BACKENDS[backend]

    want = set(
        _reference_early_stop(boxes, classes, scores, thr, label_map)
    )
    assert 0 < len(want) < len(boxes)
    for r in out:
        got = set(
            (b.x_1, b.y_1, b.x_2, b.y_2, b.type, b.score)
            for b in r.blocks
        )
        assert got == want


def test_unknown_backend_raises_with_instructions():
    with pytest.raises(NotImplementedError, match="register_backend"):
        auto_layout_model("lp://paddledetection/publaynet/ppyolov2/config")(
            None
        )
