"""Mimic the driver's correctness gate: run every queries() entry on
sf0.01 via Spark AND its oracle_sql() twin via DuckDB, then compare
row count, schema (column names) and the full value multiset EXACTLY
(bit-equal floats — the driver hash-compares, so near-equality is not
good enough)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con


def _normalize(df):
    """pandas frame → sorted list of row tuples with columns sorted by
    name; floats kept exact."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if isinstance(v, float) and math.isnan(v):
                norm.append("NaN")
            else:
                norm.append(v)
        rows.append(tuple(norm))
    rows.sort(key=lambda r: tuple(str(x) for x in r))
    return cols, rows


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    assert scols == ocols, f"{name}: columns {scols} != {ocols}"
    assert len(srows) == len(orows), (
        f"{name}: rowcount {len(srows)} != {len(orows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(srows, orows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first 3: "
        f"{mismatches[:3]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs without error; semantics pinned elsewhere


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
