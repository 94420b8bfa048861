"""CdcSink — the foreachBatch transactional apply.

Spark delivers micro-batches at-least-once with replay-stable batch ids;
idempotence is the sink's job: LakeTable.apply_batch fences on
``batch_id <= snapshot.last_batch_id`` and every commit is a single
atomic pointer swap, so a crash at ANY point replays into a no-op or a
clean re-merge — never a double-apply (BASELINE.json:6 batch-id fencing).

The foreachBatch callback runs in the driver Python process, so the
commit protocol is single-threaded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_spark.catalog.table import LakeTable
from etl_spark.operators.evolution import observed_extra_keys, promote_extra
from etl_spark.pipeline import canonicalize
from etl_spark.schemas import TABLE_COLUMNS


class CdcSink:
    def __init__(
        self,
        table: LakeTable,
        delivery: str = "ordered",
        nfc: bool = True,
        auto_promote_extra: bool = True,
    ):
        self.table = table
        self.delivery = delivery
        self.nfc = nfc
        self.auto_promote_extra = auto_promote_extra
        self.applied: list[dict] = []  # per-batch stats (driver-side diag)

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        # NB: scan parallelism comes from file splits (the engine config
        # lowers files.maxPartitionBytes, and event segments are written
        # with small parquet row groups) — no repartition here: the data
        # path's only pre-merge shuffle is the LWW window itself.
        # additive schema evolution: already-promoted columns (from the
        # snapshot) + any new extra keys observed in this batch
        already = [c for c in self.table.snapshot().columns if c not in TABLE_COLUMNS]
        new = observed_extra_keys(batch_df) if self.auto_promote_extra else []
        promoted = already + [k for k in new if k not in already]

        def canon(df: DataFrame) -> DataFrame:
            c = canonicalize(df, nfc=self.nfc)
            return promote_extra(c, promoted) if promoted else c

        # canonicalize runs inside apply_batch AFTER LWW dedup — the
        # normalize/NFC/sha256 pipeline prices winning keys, not events
        stats = self.table.apply_batch(
            batch_df, batch_id, delivery=self.delivery, canonicalizer=canon
        )
        self.applied.append(stats)
        if len(self.applied) > 10_000:  # tail mode runs forever; diag only
            del self.applied[: -5_000]
