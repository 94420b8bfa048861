"""The driver-verifiable query surface (SURVEY.md §2 → __spark_entry__).

Every SQL-expressible operator family gets a named query implemented
twice: a PySpark DataFrame program (``QUERIES[name]``) and an ANSI-SQL
oracle DuckDB runs on the same parquet (``ORACLES[name]``).  The driver
compares row counts, schemas, and order-insensitive value hashes.

Cross-engine determinism rules (enforced in every query here):
- money/quantity aggregation is EXACT: cast 2-decimal doubles to
  DECIMAL before summing (decimal addition is associative — immune to
  partial-aggregation order), round, then cast to double;
- derived integers are cast to BIGINT on both sides (Spark row_number
  is int32, DuckDB's is int64 — schema compare would flag it);
- every computed column is aliased identically in both programs;
- top-k queries always carry a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query and its
    DuckDB oracle (None → driver does the weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# importing the modules populates the registries
from etl_spark.queries import cdc, relational, training  # noqa: E402,F401
