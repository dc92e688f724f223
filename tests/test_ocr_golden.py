"""Byte-level gather_data parity on the reference's own golden Tesseract
response (tests/fixtures/ocr/test_tesseract_response.pickle — a dict with
a pandas TSV table; loads with stock pandas).

Oracle: a pandas implementation that mirrors the reference's own
computation shape (groupby over the level columns; min/min/max/max/mean;
``str.cat(sep=' ')``; positional id after the key-sorted groupby;
x_2 = x_1 + max(width) — ocr/tesseract_agent.py:135-181).  The engine's
distributed ``gather_data`` must match it EXACTLY on every aggregation
level."""

import os
import pickle

import pandas as pd
import pytest
from pyspark.sql import functions as F

from layout_parser_spark.operators.ocr_agg import TESSERACT_LEVELS, gather_data

FIX = "/root/reference/tests/fixtures/ocr/test_tesseract_response.pickle"


@pytest.fixture(scope="module")
def tsv():
    if not os.path.exists(FIX):
        pytest.skip("reference fixture absent")
    with open(FIX, "rb") as f:
        return pickle.load(f)["data"]


def pandas_gather(res: pd.DataFrame, levels):
    df = (
        res[~res.text.isna()]
        .groupby(levels)
        .apply(
            lambda gp: pd.Series(
                [
                    gp["left"].min(),
                    gp["top"].min(),
                    gp["width"].max(),
                    gp["height"].max(),
                    gp["conf"].mean(),
                    gp["text"].str.cat(sep=" "),
                ]
            ),
            include_groups=False,
        )
        .reset_index(drop=True)
        .reset_index()
        .rename(
            columns={0: "x_1", 1: "y_1", 2: "w", 3: "h", 4: "score",
                     5: "text", "index": "id"}
        )
        .assign(x_2=lambda x: x.x_1 + x.w, y_2=lambda x: x.y_1 + x.h)
        .drop(columns=["w", "h"])
    )
    return df


@pytest.mark.parametrize("level", ["page", "block", "para", "line", "word"])
def test_gather_data_matches_reference_fixture(spark, tsv, level):
    levels = TESSERACT_LEVELS[level]
    expected = pandas_gather(tsv, levels)

    # the engine consumes a token table with an explicit position column —
    # the TSV row order is the reference's implicit order
    tokens = tsv.reset_index().rename(columns={"index": "pos"})
    sdf = spark.createDataFrame(tokens)
    got = (
        gather_data(sdf, levels)
        .orderBy("id")
        .select("id", "x_1", "y_1", "x_2", "y_2", "score", "text")
        .toPandas()
    )
    assert len(got) == len(expected)
    for i in range(len(got)):
        g, e = got.iloc[i], expected.iloc[i]
        assert int(g.id) == int(e.id)
        assert float(g.x_1) == float(e.x_1) and float(g.y_1) == float(e.y_1)
        assert float(g.x_2) == float(e.x_2) and float(g.y_2) == float(e.y_2)
        assert abs(float(g.score) - float(e.score)) < 1e-9
        # THE byte contract: space-join in row order
        assert g.text == e.text, (level, i, g.text, e.text)
