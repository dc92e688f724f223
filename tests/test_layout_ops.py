"""Collection-operator ports of reference tests/test_elements.py::test_layout
(:394-403 apply functions) against the array-column implementation."""

from pyspark.sql import functions as F

from layout_parser_spark import schema as S
from layout_parser_spark.operators import layout_ops as L
from helpers import assert_block, assert_points_close


def _layout_df(spark):
    i = S.interval(4, 5, axis="y")
    q = S.quadrilateral([2, 2, 6, 2, 6, 7, 2, 5])
    r = S.rectangle(3, 3, 5, 6)
    return spark.range(1).select(F.array(i, q, r).alias("blocks"))


def test_filter_by(spark):
    """l.filter_by(t) == Layout([i]) where t wraps Interval(4,5,'y')
    (test_elements.py:399)."""
    df = _layout_df(spark)
    region = S.interval(4, 5, axis="y")
    out = df.select(L.filter_by(F.col("blocks"), region).alias("kept"))
    kept = out.collect()[0].kept
    assert len(kept) == 1
    assert_block(kept[0], "interval", start=4, end=5, axis="y")


def test_homogenize_to_max_type(spark):
    """get_homogeneous_blocks == [i.to_quadrilateral(), q,
    r.to_quadrilateral()] (test_elements.py:403)."""
    df = _layout_df(spark)
    out = df.select(L.homogenize(F.col("blocks")).alias("h")).collect()[0].h
    assert [b.block_type for b in out] == ["quadrilateral"] * 3
    # interval promoted via its canvas coords (canvas 0 → degenerate band)
    assert_points_close(out[1], [2, 2, 6, 2, 6, 7, 2, 5])
    assert_points_close(out[2], [3, 3, 5, 3, 5, 6, 3, 6])

    # all-interval layout stays interval; interval+rect homogenizes to rect
    df2 = spark.range(1).select(
        F.array(
            S.interval(1, 2, "x"), S.rectangle(0, 0, 1, 1)
        ).alias("blocks")
    )
    out2 = df2.select(L.homogenize(F.col("blocks")).alias("h")).collect()[0].h
    assert [b.block_type for b in out2] == ["rectangle", "rectangle"]


def test_map_sort_texts_info(spark):
    blocks = F.array(
        S.rectangle(0, 10, 1, 11, text="low", id=1),
        S.rectangle(0, 0, 1, 1, text="high", id=2),
        S.rectangle(0, 5, 1, 6, id=3),  # no text
    )
    df = spark.range(1).select(blocks.alias("blocks"))
    row = df.select(
        L.sort_blocks(F.col("blocks"), key=lambda b: b["y_1"]).alias("s"),
        L.sort_blocks(
            F.col("blocks"), key=lambda b: b["y_1"], reverse=True
        ).alias("sr"),
        L.get_texts(F.col("blocks")).alias("texts"),
        L.get_info(F.col("blocks"), "id").alias("ids"),
        L.shift_blocks(F.col("blocks"), 1, 2).alias("sh"),
        L.slice_blocks(F.col("blocks"), 1, 2).alias("sl"),
        L.concat_layouts(F.col("blocks"), F.col("blocks")).alias("cc"),
        L.block_at(F.col("blocks"), 0).alias("b0"),
        L.block_at(F.col("blocks"), 2).alias("b2"),
        L.block_at(F.col("blocks"), -1).alias("bneg"),
    ).collect()[0]
    assert [b.text for b in row.s] == ["high", None, "low"]
    assert [b.text for b in row.sr] == ["low", None, "high"]
    assert row.texts == ["low", "high"]
    assert row.ids == [1, 2, 3]
    assert row.sh[0].x_1 == 1.0 and row.sh[0].y_1 == 12.0
    assert [b.id for b in row.sl] == [2, 3]
    assert len(row.cc) == 6
    # 0-based indexing incl. Python negative-index semantics
    assert row.b0.id == 1 and row.b2.id == 3 and row.bneg.id == 3


def test_is_in_blocks_matches_reference_layout_case(spark):
    """l.is_in(r) == [block.is_in(r) for block in [i,q,r]]
    (test_elements.py:402)."""
    df = _layout_df(spark)
    r = S.rectangle(3, 3, 5, 6)
    out = df.select(L.is_in_blocks(F.col("blocks"), r).alias("m")).collect()[0].m
    # i(4..5 on y) within r's y-band 3..6 → True; q not in r; r in itself
    assert out == [True, False, True]


def test_explode_blocks(spark):
    df = _layout_df(spark).withColumn("doc_id", F.lit(7))
    ex = L.explode_blocks(df)
    rows = ex.collect()
    assert [r.block_pos for r in rows] == [0, 1, 2]
    assert {r["block"]["block_type"] for r in rows} == {
        "interval", "quadrilateral", "rectangle"
    }


def test_slice_and_index_match_python_semantics(spark):
    """slice_blocks / block_at mirror Layout.__getitem__ (layout.py:68-96):
    0-based python slicing over the block array."""
    from layout_parser_spark import schema as S
    from layout_parser_spark.operators.layout_ops import (
        block_at,
        concat_layouts,
        slice_blocks,
    )
    from pyspark.sql import functions as F

    blocks = F.array(
        *[
            S.rectangle(float(i), 0.0, float(i) + 1.0, 1.0, text=f"b{i}")
            for i in range(5)
        ]
    )
    row = (
        spark.range(1)
        .select(blocks.alias("blocks"))
        .select(
            F.transform(
                slice_blocks(F.col("blocks"), 1, 3), lambda b: b["text"]
            ).alias("mid"),
            block_at(F.col("blocks"), 0)["text"].alias("first"),
            block_at(F.col("blocks"), 4)["text"].alias("last"),
            F.size(
                concat_layouts(F.col("blocks"), F.col("blocks"))
            ).alias("doubled"),
        )
        .collect()[0]
    )
    texts = [f"b{i}" for i in range(5)]
    assert row.mid == texts[1:4]          # python blocks[1:1+3]
    assert row.first == "b0" and row.last == "b4"
    assert row.doubled == 10


def test_detect_table_grid(spark):
    """3×2 jittered grid of cells → correct (row_id, col_id) positions;
    a second document with one cell stays (0,0) with n_rows=n_cols=1."""
    from layout_parser_spark.operators.grouping import detect_table_grid

    cells = []
    cid = 0
    for r in range(3):
        for c in range(2):
            jx, jy = (cid % 3) * 1.5, (cid % 2) * 2.0  # jitter < tol
            cells.append(
                ("d1", cid, c * 100.0 + jx, r * 40.0 + jy,
                 c * 100.0 + jx + 30, r * 40.0 + jy + 10)
            )
            cid += 1
    cells.append(("d2", 99, 5.0, 5.0, 20.0, 12.0))
    df = spark.createDataFrame(
        cells,
        "doc string, block_id long, x_1 double, y_1 double, "
        "x_2 double, y_2 double",
    )
    out = {
        (r.doc, r.cell_id): (r.row_id, r.col_id, r.n_rows, r.n_cols)
        for r in detect_table_grid(df, ["doc"]).collect()
    }
    cid = 0
    for r in range(3):
        for c in range(2):
            assert out[("d1", cid)] == (r, c, 3, 2), (cid, out[("d1", cid)])
            cid += 1
    assert out[("d2", 99)] == (0, 0, 1, 1)


def test_asof_join_semantics(spark):
    """Backward as-of: latest right at-or-before each left ts; equal
    timestamps MATCH (right sorts first); no prior snapshot → NULLs."""
    from layout_parser_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 5, "l5"), ("u", 10, "l10"), ("u", 2, "l2"),
         ("v", 7, "lv")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u", 3, "r3"), ("u", 10, "r10"), ("w", 1, "rw")],
        "k string, ts long, state string",
    )
    out = {
        (r.k, r.ts): r.state
        for r in asof_join(left, right, on=["k"], ts_col="ts").collect()
    }
    assert out == {
        ("u", 2): None,     # before any snapshot
        ("u", 5): "r3",     # latest <= 5
        ("u", 10): "r10",   # equal ts matches
        ("v", 7): None,     # key with no snapshots at all
    }


def test_asof_join_rejects_payload_collision(spark):
    """A left column sharing a name with a right payload column must
    raise — the union alignment would otherwise silently null out the
    left data."""
    import pytest

    from layout_parser_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 5, "keepme")], "k string, ts long, state string"
    )
    right = spark.createDataFrame(
        [("u", 3, "r3")], "k string, ts long, state string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["k"], ts_col="ts")


def test_range_join_boundaries(spark):
    """lo inclusive, hi exclusive; overlapping intervals both match;
    bucket decomposition loses nothing at bucket borders."""
    from layout_parser_spark.operators.temporal import range_join

    pts = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 6.9), (4, 7.0), (5, 9.99), (6, 100.0)],
        "pid long, value double",
    )
    iv = spark.createDataFrame(
        [(0, 0.0, 7.0), (1, 5.0, 12.0)], "wid long, lo double, hi double"
    )
    out = {
        (r.pid, r.wid)
        for r in range_join(pts, iv, value_col="value",
                            bucket_width=5.0).collect()
    }
    assert out == {
        (1, 0),          # lo inclusive
        (2, 0), (2, 1),  # overlap region
        (3, 0), (3, 1),
        (4, 1),          # hi exclusive for w0
        (5, 1),
    }
