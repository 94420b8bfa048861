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

import json
import os
import time

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
        checkpoint_dir: str | None = None,
        views: list | None = None,
        maintain_every: int = 0,
        maintain_kwargs: dict | None = None,
    ):
        self.table = table
        self.delivery = delivery
        self.nfc = nfc
        self.auto_promote_extra = auto_promote_extra
        self.checkpoint_dir = checkpoint_dir
        # IncrementalViews maintained inside the streaming loop: each is
        # refreshed after every committed micro-batch, so downstream
        # rollups lag the table by at most one trigger.  View state is
        # checkpointed independently (its own meta.json) — a crash
        # between table commit and view refresh is healed by the next
        # refresh consuming the missed changelog range.
        self.views = list(views or [])
        # periodic in-loop maintenance: vacuum's concurrency contract is
        # "run maintain() in the same single-writer loop as apply_batch"
        # — this is that loop.  Every ``maintain_every`` committed
        # batches the sink runs table.maintain(**maintain_kwargs)
        # between triggers (stats-driven: a no-op costs one manifest
        # read).  0 disables.
        self.maintain_every = int(maintain_every)
        self.maintain_kwargs = dict(maintain_kwargs or {})
        self._committed_since_maintain = 0
        self.applied: list[dict] = []  # per-batch stats (driver-side diag)
        # hot-path caches (single-writer model: this sink owns the table
        # while its query runs, so locally tracked metadata cannot go
        # stale).  Both rebuild from one snapshot load on the first batch
        # after any restart; steady-state batches then read NO manifest
        # in the sink — apply_batch's own snapshot load is the only
        # per-batch metadata I/O (r4 review: three full manifest+shard
        # loads per micro-batch on the streaming hot path).
        self._offset: int | None = None
        self._extra_cols: list[str] | None = None
        self._stream_id: str | None = None

    def _offset_key(self) -> str:
        """Table-property key for this stream's epoch→batch-id offset.

        Keyed by the streaming query's STABLE id (persisted by Spark in
        ``<checkpoint>/metadata``; unchanged across restarts of the same
        checkpoint, fresh for a new checkpoint).  An UNkeyed persisted
        offset made the second fresh checkpoint over a table silently
        lossy: its epochs restart at 0, the stale offset mapped new
        segments below the fence, and they were dropped as replays
        (r4 review).  Keying by query id gives each checkpoint
        generation its own mapping, derived once from the fence."""
        if self.checkpoint_dir is None:
            return "stream_epoch_offset"
        if self._stream_id is None:
            with open(os.path.join(self.checkpoint_dir, "metadata")) as f:
                self._stream_id = str(json.load(f)["id"])
        return f"stream_epoch_offset.{self._stream_id}"

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
        set_props = None
        if self._offset is None:
            snap = self.table.snapshot()
            key = self._offset_key()
            off_prop = snap.properties.get(key)
            if off_prop is None:
                self._offset = snap.last_batch_id + 1 - batch_id
                # this stream's mapping REPLACES any predecessor's: a
                # stale mapping must never be consulted again, so prior
                # stream_epoch_offset* properties are deleted (None
                # value) in the same atomic commit.  If Spark re-delivers
                # an epoch the old mapping already applied, the new
                # mapping assigns it a fresh id above the fence and the
                # re-merge is a no-op by LWW/admission idempotence.
                set_props = {
                    k: None
                    for k in snap.properties
                    if k.startswith("stream_epoch_offset")
                }
                set_props[key] = str(self._offset)
            else:
                self._offset = int(off_prop)
            self._extra_cols = [
                c for c in snap.columns if c not in TABLE_COLUMNS
            ]
        batch_id = batch_id + self._offset
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
        # additive schema evolution: already-promoted columns (tracked
        # locally; seeded from the snapshot on the first batch) + any new
        # extra keys observed in this batch.  The observation job runs
        # SYNCHRONOUSLY on the foreachBatch chain — an earlier build
        # submitted it from a background thread to overlap apply_batch's
        # stats job, and the resulting concurrent AQE SQL executions hit
        # a lost-stage-event race in Spark's AdaptiveSparkPlanExec (the
        # stream hung forever inside withFinalPlanUpdate's queue.take
        # with an otherwise idle JVM).  Every Spark job this engine runs
        # per batch is single-chain by design now; latency is recovered
        # by fusing jobs, never by overlapping SQL executions.
        new = observed_extra_keys(batch_df) if self.auto_promote_extra else []
        promoted = list(self._extra_cols) + [
            k for k in new if k not in self._extra_cols
        ]

        def canon(df: DataFrame) -> DataFrame:
            c = canonicalize(df, nfc=self.nfc)
            return promote_extra(c, promoted) if promoted else c

        # canonicalize runs inside apply_batch AFTER LWW dedup — the
        # normalize/NFC/sha256 pipeline prices winning keys, not events
        t_apply = time.monotonic()
        stats = self.table.apply_batch(
            batch_df, batch_id, delivery=self.delivery, canonicalizer=canon,
            set_properties=set_props,
        )
        self._extra_cols = promoted  # committed (or already known) now
        # end-to-end apply wall clock: the table's own latency_ms is
        # stamped BEFORE the snapshot commit and any debt-triggered
        # compaction, so it understates what the stream actually waited
        stats["sink_ms"] = int((time.monotonic() - t_apply) * 1000)
        stats["quarantined"] = quarantined
        # views refresh on SKIPPED batches too (ADVICE r4): the crash-heal
        # path — crash between table commit and view refresh — redelivers
        # an epoch that is now fenced and hence skipped; the missed
        # changelog range must heal on that redelivery, not whenever the
        # next non-skipped batch happens to arrive (an availableNow drain
        # may never produce one).  A no-change refresh is changelog-driven
        # and cheap (manifest read, zero Spark jobs).
        if self.views:
            t_views = time.monotonic()
            stats["views"] = [v.refresh()["mode"] for v in self.views]
            stats["view_refresh_ms"] = int(
                (time.monotonic() - t_views) * 1000
            )
        if self.maintain_every and not stats.get("skipped"):
            self._committed_since_maintain += 1
            if self._committed_since_maintain >= self.maintain_every:
                self._committed_since_maintain = 0
                t_m = time.monotonic()
                stats["maintain"] = self.table.maintain(**self.maintain_kwargs)
                stats["maintain_ms"] = int((time.monotonic() - t_m) * 1000)
        self.applied.append(stats)
        if len(self.applied) > 10_000:  # tail mode runs forever; diag only
            del self.applied[: -5_000]

    def _quarantine(self, batch_df: DataFrame, batch_id: int) -> tuple[DataFrame, int]:
        """Split rejects out of a JSON micro-batch: the raw line (or the
        re-serialized row, for parseable-but-keyless objects) lands in
        ``<table>/quarantine/batch-<id>/`` with a reason column — file
        named by batch id, so re-delivery overwrites idempotently.

        Steady-state cost is ONE narrow count job per micro-batch (the
        zero-reject common case); the quarantine write job runs only
        when that count is non-zero, so a clean long-running tail adds
        neither a per-batch write nor an empty batch directory
        (r4 review: the unconditional write+read-back was two fixed-cost
        jobs per batch and leaked one empty dir per batch forever)."""
        bad_cond = reject_condition()
        n = int(batch_df.filter(bad_cond).count())
        good = batch_df.filter(~bad_cond).drop("_corrupt_record")
        if n == 0:
            return good, 0
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
        return good, n
