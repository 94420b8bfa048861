"""Local replica of the driver's correctness gate.

For every query with a DuckDB oracle: run the Spark DataFrame program
and the oracle SQL on the same sf0.001 parquet, then require identical
row counts, identical sorted column names, and EXACT cell-level equality
(floats compared by repr — any cross-engine bit divergence fails here
before the driver ever sees it).  Rows-only queries must return a
DataFrame with >= 0 rows and a stable schema.

Fetch fidelity: BOTH sides go through pandas — Spark via ``toPandas()``,
DuckDB via ``.df()`` — because that is the only rendering consistent
with the r02 driver evidence: ``window_order_gaps`` (nullable BIGINT →
float64 on both sides) PASSED while ``docs_corpus_summary`` (DuckDB
``SUM(BIGINT)`` → HUGEINT → float64 '3549.0' vs Spark int64 '3549')
FAILED.  ``fetchall()`` would hide the HUGEINT class entirely (it yields
Python ints), which is exactly why r02's pytest was green while the
driver failed.

The parity set is the LOCAL registry (exported queries PLUS local-only
baselines), so deregistering a query from the driver window never drops
its local verification.
"""

from __future__ import annotations

import datetime
import math

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from etl_spark.queries import (
    DRIVER_WINDOW,
    LOCAL_ORACLES,
    LOCAL_QUERIES,
    resolved_oracles,
)
from etl_spark.queries.training import ivf_kmeans_oracle_for, pq_adc_oracle_for

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

# data-derived oracles are generated per sf dir; regenerate for the sf
# this test session runs at (the exported default targets the driver's
# sf0.01).  Lazy oracle callables materialize here, exactly as
# __spark_entry__.oracle_sql() materializes them for the driver.
# strict: a generator failure here must FAIL the suite, not silently
# demote its query to a rows-only check (r4 review)
ORACLES = resolved_oracles(LOCAL_ORACLES, strict=True)
ORACLES["ann_ivf_kmeans_topk"] = ivf_kmeans_oracle_for(SF_DIR)
ORACLES["ann_pq_adc_topk"] = pq_adc_oracle_for(SF_DIR)

QUERIES = LOCAL_QUERIES
WITH_ORACLE = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_rows_only_set_is_exactly_the_documented_ones():
    """Every query except these two local-only seeded-LSH variants has a
    value-exact oracle; any demotion (an oracle dropped or a new query
    registered without one) must fail HERE, not degrade silently."""
    assert ROWS_ONLY == ["ann_ivf_topk", "ann_random_hyperplane_buckets"]


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
    # numpy scalars (the pandas path) normalize to their Python builtins
    # so int64 == int; a HUGEINT that decayed to float64 stays a float
    # and mismatches an int — exactly like the driver's value hash
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__ == "numpy":
        v = item()
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"  # pandas renders SQL NULL as NaN
        if v == 0.0:
            return "0.0"  # -0.0 == 0.0
        return repr(v)
    if isinstance(v, datetime.datetime):
        # the pandas path renders SQL DATE as a midnight Timestamp; the
        # driver equates it with Spark's date (these queries passed r02)
        if v.tzinfo is None and v.time() == datetime.time():
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return f"{type(v).__name__}:{v!r}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    scols = list(spdf.columns)
    srows = list(spdf.itertuples(index=False, name=None))

    pdf = duck.execute(ORACLES[name]).df()
    dcols = list(pdf.columns)
    drows = list(pdf.itertuples(index=False, name=None))

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


def test_driver_window_contract():
    """The driver verifies only the first DRIVER_WINDOW queries() entries:
    the exported registry must fit inside the window, with every
    oracle-backed query registered before any rows-only one."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) <= DRIVER_WINDOW
    assert set(o) <= set(q)
    names = list(q)
    n_oracle = len(o)
    assert names[:n_oracle] == [n for n in names if n in o], (
        "oracle-backed queries must be registered before rows-only ones"
    )
    # everything exported is also locally verified
    assert set(q) <= set(LOCAL_QUERIES)


def test_doc_counts_match_registry():
    """README.md / COVERAGE.md quote registry sizes; those drift one query
    at a time as variants are added (VERDICT r3 item 9) — pin them to
    the live registry so they can't rot."""
    import re

    from etl_spark.queries import ORACLES, QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(repo, "README.md")).read()
    coverage = open(os.path.join(repo, "COVERAGE.md")).read()

    nq, no = len(LOCAL_QUERIES), len(LOCAL_ORACLES)
    assert f"{nq} named queries ({len(QUERIES)} driver-exported)" in readme
    assert f"{no} with exact DuckDB oracles" in readme
    assert f"{nq}-query / {no}-oracle set" in readme
    assert f"all {nq} local queries" in coverage and f"{no} oracles" in coverage
    # and the exported window itself
    assert len(QUERIES) == 50 and len(ORACLES) == 50
    # any other stale counts of the form "N named queries" would be caught
    for m in re.finditer(r"(\d+) named queries", readme):
        assert int(m.group(1)) == nq
