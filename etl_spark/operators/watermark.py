"""Monotonic per-partition high-watermark vector (BASELINE.json:6).

The vector {part_id -> max applied seq} is engine state: it lives in the
snapshot manifest (not the Spark state store), advances monotonically via
``merge_watermarks`` and backs (a) lineage/metrics, (b) resume audits,
and (c) the optional ordered-source duplicate-admission fast path.

Correctness does NOT depend on admission: the tombstoned LWW merge
converges for arbitrary delivery order.  Admission only short-circuits
work when the source honors the binlog contract (per-partition prefix
replay: any event with seq <= watermark is a duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_high_watermarks(batch: DataFrame) -> dict[int, int]:
    """{part_id: max seq} over one batch (small collect: one row/partition)."""
    rows = batch.groupBy("part_id").agg(F.max("seq").alias("hi")).collect()
    return {int(r["part_id"]): int(r["hi"]) for r in rows}


def merge_watermarks(old: dict[int, int], new: dict[int, int]) -> dict[int, int]:
    """Monotone pointwise max — a watermark never regresses."""
    out = dict(old)
    for p, hi in new.items():
        if hi > out.get(p, -1):
            out[p] = hi
    return out


def admission_filter(
    batch: DataFrame, watermarks: dict[int, int], spark: SparkSession
) -> DataFrame:
    """Drop events at-or-below the per-partition watermark (duplicates
    under the ordered-source contract).

    Small vectors (the common case: one entry per source partition)
    compile to a literal CASE expression — pure whole-stage-codegen
    filter, no per-batch createDataFrame round-trip and no broadcast
    exchange, which were two fixed costs on every steady-state
    micro-batch.  Very wide vectors fall back to a broadcast join
    (a thousand-branch CASE would bloat the codegen)."""
    if not watermarks:
        return batch
    if len(watermarks) <= 256:
        wm_expr = F.lit(-1).cast("long")
        for p, s in sorted(watermarks.items()):
            wm_expr = (
                F.when(F.col("part_id") == p, F.lit(int(s)).cast("long"))
                .otherwise(wm_expr)
            )
        return batch.filter(F.col("seq") > wm_expr)
    wm = spark.createDataFrame(
        [(int(p), int(s)) for p, s in watermarks.items()], "part_id int, _wm long"
    )
    return (
        batch.join(F.broadcast(wm), "part_id", "left")
        .filter(F.col("seq") > F.coalesce(F.col("_wm"), F.lit(-1)))
        .drop("_wm")
    )
