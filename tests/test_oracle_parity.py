"""Local replica of the driver's correctness gate.

For every query with a DuckDB oracle: run the Spark DataFrame program
and the oracle SQL on the same sf0.001 parquet, then require identical
row counts, identical sorted column names, and EXACT cell-level equality
(floats compared by repr — any cross-engine bit divergence fails here
before the driver ever sees it).  Rows-only queries must return a
DataFrame with >= 0 rows and a stable schema.
"""

from __future__ import annotations

import datetime
import math

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ETL_SPARK_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0.0"  # -0.0 == 0.0
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return f"{type(v).__name__}:{v!r}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
WITH_ORACLE = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
    mismatches = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sc[mismatches[0]]} oracle={dc[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(["repo", "path", "commit", "lang", "content_sha"]) == set(df.columns)
