"""Structured Streaming tailer tests: bounded replay (availableNow),
resume-from-checkpoint after crash (fixture 5), duplicate file drops."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df, write_event_batches
from etl_spark.oracle import FINAL_COLUMNS, replay_events
from etl_spark.streaming.sink import CdcSink
from etl_spark.streaming.tailer import run_tailer


def _final_state(table):
    return (
        table.read()
        .select(*FINAL_COLUMNS)
        .toPandas()
        .sort_values(["repo", "path"], kind="mergesort")
        .reset_index(drop=True)
    )


def _assert_state_equal(got, want):
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_streaming_replay_available_now(spark, tmp_path):
    ev = events_df(spark, 800, n_repos=8, paths_per_repo=20)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, n_batches=4)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8, salt=4)
    q, sink = run_tailer(
        t, event_dir, str(tmp_path / "ckpt"), mode="replay", max_files_per_trigger=1
    )
    applied = [s for s in sink.applied if not s.get("skipped")]
    assert len(applied) == 4
    # every applied batch carries the end-to-end sink wall time (merge +
    # commit + any inline compaction) — the tail bench's latency source
    assert all(s.get("sink_ms", 0) > 0 for s in applied)
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))
    # watermarks cover every partition
    assert set(t.snapshot().wm()) == {0, 1, 2, 3}


def test_second_fresh_checkpoint_ingests_new_segments(spark, tmp_path):
    """The epoch→batch-id offset is keyed by the streaming query's id: a
    SECOND fresh checkpoint must derive its own mapping from the fence
    instead of reusing the first checkpoint's persisted offset — which
    mapped new segments below the fence and silently dropped them (an
    epoch can bundle an old segment WITH a brand-new one)."""
    ev = events_df(spark, 900, n_repos=8, paths_per_repo=20)
    event_dir = str(tmp_path / "events")
    # segments 0..2 arrive first; segment 3 lands after checkpoint loss
    write_event_batches(ev.filter(F.col("seq") < 600), event_dir, n_batches=3)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8, salt=4)
    run_tailer(t, event_dir, str(tmp_path / "ckptA"), mode="replay",
               max_files_per_trigger=1)
    # the offset persisted under a per-query key (not the legacy global)
    props_a = t.snapshot().properties
    assert any(k.startswith("stream_epoch_offset.") for k in props_a)
    assert "stream_epoch_offset" not in props_a
    write_event_batches(
        ev.filter(F.col("seq") >= 600), event_dir + "-late", n_batches=1
    )
    import shutil as _sh

    _sh.copy(
        event_dir + "-late/batch-00000.parquet",
        event_dir + "/batch-09999.parquet",
    )
    # checkpoint A is lost; a FRESH checkpoint re-drains everything with
    # epochs restarting at 0, two files per epoch — the new segment
    # shares an epoch with an already-applied one
    run_tailer(t, event_dir, str(tmp_path / "ckptB"), mode="replay",
               max_files_per_trigger=2)
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))
    # checkpoint B's mapping REPLACED checkpoint A's (retired atomically
    # with B's first commit) — exactly one live mapping at a time
    keys_b = [
        k for k in t.snapshot().properties
        if k.startswith("stream_epoch_offset")
    ]
    keys_a = [k for k in props_a if k.startswith("stream_epoch_offset")]
    assert len(keys_b) == 1 and keys_b != keys_a


def test_streaming_replay_merge_on_read_auto(spark, tmp_path):
    # the full streaming path (readStream -> foreachBatch -> commit)
    # with merge-on-read: steady-state batches land as deltas yet the
    # final state matches the serial oracle exactly.  (write_mode="auto"
    # would correctly decline MoR here — this fixture's base is no
    # bigger than each delta, so rewrite amplification is ~1.)
    ev = events_df(spark, 800, n_repos=8, paths_per_repo=20)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, n_batches=4)
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), n_buckets=8, salt=4,
        write_mode="mor", mor_compact_ratio=10.0,
    )
    _q, sink = run_tailer(
        t, event_dir, str(tmp_path / "ckpt"), mode="replay", max_files_per_trigger=1
    )
    applied = [s for s in sink.applied if not s.get("skipped")]
    assert len(applied) == 4
    assert any(s.get("mode") == "mor" for s in applied), "auto never chose MoR"
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))


def test_streaming_duplicate_file_redelivery(spark, tmp_path):
    """The same events re-dropped as extra files (source-level at-least-
    once): admission + LWW keep the state exactly-once."""
    ev = events_df(spark, 500, n_repos=6, paths_per_repo=15)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, n_batches=3, duplicate_pct=30)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8, salt=4)
    run_tailer(t, event_dir, str(tmp_path / "ckpt"), mode="replay", max_files_per_trigger=1)
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))


class _CrashingSink(CdcSink):
    """Crashes the stream AFTER the Nth successful commit — simulating a
    driver death between table commit and Spark checkpoint commit (the
    worst window: Spark will re-deliver the batch on restart)."""

    def __init__(self, table, crash_after: int, **kw):
        super().__init__(table, **kw)
        self.crash_after = crash_after

    def apply(self, batch_df, batch_id):
        super().apply(batch_df, batch_id)
        done = len([s for s in self.applied if not s.get("skipped")])
        if done >= self.crash_after:
            raise RuntimeError("injected crash after commit")


def test_fixture5_resume_from_checkpoint(spark, tmp_path):
    from etl_spark.sources.events import read_event_stream

    ev = events_df(spark, 900, n_repos=8, paths_per_repo=20)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, n_batches=6)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8, salt=4)
    ckpt = str(tmp_path / "ckpt")

    # phase 1: crash after 3 committed batches (post-commit, pre-checkpoint)
    sink = _CrashingSink(t, crash_after=3, checkpoint_dir=ckpt)
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    committed_after_crash = t.snapshot().last_batch_id
    assert committed_after_crash >= 2

    # phase 2: restart from the same checkpoint — the crashed batch is
    # re-delivered and must hit the fence; the rest applies once each
    q2, sink2 = run_tailer(t, event_dir, ckpt, mode="replay", max_files_per_trigger=1)
    fenced = [s for s in sink2.applied if s.get("skipped")]
    assert fenced, "re-delivered batch must be fenced"
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))

    # lineage: metrics rows exist for every committed batch exactly once
    m = t.metrics().toPandas()
    per_batch = m.groupby("batch_id")["part_id"].count()
    assert (per_batch > 0).all()
    applied_total = int(m[m.part_id >= 0]["rows_applied"].sum())
    assert applied_total == 900  # every event applied exactly once


def test_fresh_tailer_on_backfilled_table_loses_nothing(spark, tmp_path):
    """Bootstrap backfill (direct apply_batch) then tail with a FRESH
    checkpoint: streaming epochs restart at 0, which previously collided
    with the backfill's batch id and fence-dropped the first micro-batch.
    The sink's persisted epoch offset maps epoch 0 -> next free id."""
    from etl_spark.pipeline import canonicalize

    ev = events_df(spark, 600, n_repos=8, paths_per_repo=20)
    base = ev.filter(F.col("seq") < 300)
    tail = ev.filter(F.col("seq") >= 300)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8, salt=4)
    t.apply_batch(base, 0, canonicalizer=canonicalize)

    event_dir = str(tmp_path / "events")
    write_event_batches(tail, event_dir, n_batches=2)
    _q, sink = run_tailer(
        t, event_dir, str(tmp_path / "ckpt"), mode="replay",
        max_files_per_trigger=1,
    )
    applied = [s for s in sink.applied if not s.get("skipped")]
    assert [s["batch_id"] for s in applied] == [1, 2]  # nothing fenced away
    # persisted under the streaming query's id (fresh checkpoints get
    # their own mapping; same-checkpoint restarts reuse this one)
    offsets = {
        k: v for k, v in t.snapshot().properties.items()
        if k.startswith("stream_epoch_offset")
    }
    assert list(offsets.values()) == ["1"]
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))

    # late segment under the SAME checkpoint: offset comes from the
    # persisted property (not recomputed), so ids keep advancing by one
    late = events_df(spark, 100, n_repos=8, paths_per_repo=20, start_seq=600)
    write_event_batches(late, event_dir + "-late", n_batches=1)
    import shutil as _sh

    _sh.copy(
        event_dir + "-late/batch-00000.parquet",
        event_dir + "/batch-00099.parquet",
    )
    _q2, sink2 = run_tailer(
        t, event_dir, str(tmp_path / "ckpt"), mode="replay",
        max_files_per_trigger=1,
    )
    applied2 = [s for s in sink2.applied if not s.get("skipped")]
    assert [s["batch_id"] for s in applied2] == [3]
    all_ev = ev.unionByName(late)
    _assert_state_equal(_final_state(t), replay_events(all_ev.toPandas()))


def test_in_loop_maintenance_runs_every_n_batches(spark, tmp_path):
    """maintain() must run in the same single-writer loop as apply_batch
    (vacuum's concurrency contract): maintain_every wires it into the
    sink between triggers, stats-driven so an idle pass is one manifest
    read, and history retention shows it actually vacuumed."""
    ev = events_df(spark, 800, n_repos=8, paths_per_repo=20)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, n_batches=4)
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8, salt=4)
    _q, sink = run_tailer(
        t, event_dir, str(tmp_path / "ckpt"), mode="replay",
        max_files_per_trigger=1, maintain_every=2,
        maintain_kwargs={"retain_versions": 2, "stale_grace_sec": 0,
                         "max_files_per_bucket": 1e9},
    )
    applied = [s for s in sink.applied if not s.get("skipped")]
    ran = [s for s in applied if "maintain" in s]
    assert len(ran) == 2 and all(s["maintain_ms"] >= 0 for s in ran)
    # vacuum actually enforced retention inside the loop
    assert len(t.history()) <= 3
    _assert_state_equal(_final_state(t), replay_events(ev.toPandas()))
