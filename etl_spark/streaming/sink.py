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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.catalog.table import LakeTable
from etl_spark.operators.evolution import observed_extra_keys, promote_extra
from etl_spark.pipeline import canonicalize
from etl_spark.schemas import EVENT_COLUMNS, TABLE_COLUMNS
from etl_spark.sources.events import reject_condition


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
        # Streaming epochs restart at 0 under a FRESH checkpoint, but the
        # table may already hold batches (bootstrap backfill via
        # apply_batch, then tail) — raw epoch 0 would hit the fence and
        # the first micro-batch would be silently DROPPED.  Map
        # epoch -> table batch id through an offset persisted in the
        # table properties: computed once (next free id minus this
        # epoch), committed atomically WITH the first batch, stable
        # across restarts and re-deliveries (same epoch -> same id ->
        # fence works exactly as before).
        snap = self.table.snapshot()
        off_prop = snap.properties.get("stream_epoch_offset")
        set_props = None
        if off_prop is None:
            offset = snap.last_batch_id + 1 - batch_id
            set_props = {"stream_epoch_offset": str(offset)}
        else:
            offset = int(off_prop)
        batch_id = batch_id + offset
        # JSONL source: rejects (unparseable lines, null-envelope rows)
        # are retained under <table>/quarantine/ and counted — never
        # silently dropped, never merged
        quarantined = 0
        if "_corrupt_record" in batch_df.columns:
            batch_df, quarantined = self._quarantine(batch_df, batch_id)
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
            batch_df, batch_id, delivery=self.delivery, canonicalizer=canon,
            set_properties=set_props,
        )
        stats["quarantined"] = quarantined
        self.applied.append(stats)
        if len(self.applied) > 10_000:  # tail mode runs forever; diag only
            del self.applied[: -5_000]

    def _quarantine(self, batch_df: DataFrame, batch_id: int) -> tuple[DataFrame, int]:
        """Split rejects out of a JSON micro-batch: the raw line (or the
        re-serialized row, for parseable-but-keyless objects) lands in
        ``<table>/quarantine/batch-<id>/`` with a reason column — file
        named by batch id, so re-delivery overwrites idempotently.  The
        count comes from the written files' footers (one metadata-only
        read), not a second parse of the JSON batch; rejects are
        exceptional, so the extra write job is usually empty-input."""
        bad_cond = reject_condition()
        qdir = os.path.join(
            self.table.root, "quarantine", f"batch-{batch_id:08d}"
        )
        (
            batch_df.filter(bad_cond)
            .select(
                F.coalesce(
                    F.col("_corrupt_record"),
                    F.to_json(F.struct(*EVENT_COLUMNS)),
                ).alias("raw"),
                F.when(
                    F.col("_corrupt_record").isNotNull(), F.lit("malformed_json")
                )
                .otherwise(F.lit("null_envelope"))
                .alias("reason"),
                F.lit(batch_id).cast("long").alias("batch_id"),
            )
            .write.mode("overwrite")
            .parquet(qdir)
        )
        n = self.table.spark.read.parquet(qdir).count()
        good = batch_df.filter(~bad_cond).drop("_corrupt_record")
        return good, int(n)
