"""Snapshot rollback (Delta RESTORE / Iceberg rollback_to_snapshot analog)
and named tags: state restoration, fence/watermark re-admission, vacuum
retention exemption, changelog-visible reverts, and post-rollback
streaming re-ingest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df, write_event_batches
from etl_spark.pipeline import canonicalize
from etl_spark.streaming.tailer import run_tailer

STATE_COLS = ["repo", "path", "commit", "content_sha"]


def _state(t: LakeTable, version=None):
    return sorted(map(tuple, t.read(version=version).select(*STATE_COLS).collect()))


def _mk(spark, tmp_path, n=400):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4, salt=2)
    ev = events_df(spark, n, n_repos=5, paths_per_repo=12)
    return t, ev


def test_rollback_restores_state_fence_and_watermarks(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    target_v = t.snapshot().version
    target_state = _state(t)
    target_snap = t.snapshot()
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    head_v = t.snapshot().version
    assert _state(t) != target_state

    res = t.rollback(target_v)
    snap = t.snapshot()
    # a NEW monotonic commit, not a pointer rewind: history keeps growing
    assert res["version"] == snap.version == head_v + 1
    assert snap.parent == head_v
    assert _state(t) == target_state
    # fence + admission watermarks restored verbatim -> re-ingest works
    assert snap.last_batch_id == target_snap.last_batch_id == 0
    assert snap.wm() == target_snap.wm()
    assert snap.properties["restored_version"] == str(target_v)
    assert snap.properties["rolled_back_from"] == str(head_v)
    # the head is still time-travelable (rollback is non-destructive)
    assert len(_state(t, version=head_v)) >= len(target_state)


def test_rollback_then_reapply_converges_to_original_head(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    target_v = t.snapshot().version
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    head_state = _state(t)
    t.rollback(target_v)
    # batch 1 is no longer fenced after the rollback; re-applying it must
    # reproduce the original head state exactly (deterministic merge)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    assert _state(t) == head_state


def test_rollback_rejects_noop_and_stale_above_current(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    v1 = t.snapshot().version
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    head = t.snapshot().version
    head_state = _state(t)
    with pytest.raises(ValueError, match="already at"):
        t.rollback(head)
    # a crashed commit can leave a v-file ABOVE the pointer; restoring to
    # uncommitted state must be refused
    import json

    with open(t.log._vpath(head)) as f:
        stale = json.load(f)
    stale["version"] = head + 7
    with open(t.log._vpath(head + 7), "w") as f:
        json.dump(stale, f)
    with pytest.raises(ValueError, match="roll forward"):
        t.rollback(head + 7)
    os.remove(t.log._vpath(head + 7))
    # un-rollback: the pre-rollback head is itself a restorable snapshot
    t.rollback(v1)
    assert _state(t) != head_state
    t.rollback(head)
    assert _state(t) == head_state


def test_tagged_version_survives_vacuum_and_rolls_back(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    t.tag("pre-backfill")
    tagged_v = t.tags()["pre-backfill"]
    tagged_state = _state(t)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    t.compact()  # orphans the tagged version's files from LATEST's view
    t.vacuum(retain_versions=1, stale_grace_sec=0)
    # tagged manifest AND its data files stay live despite retain=1
    assert tagged_v in t.history()
    assert _state(t, version=tagged_v) == tagged_state
    t.rollback("pre-backfill")  # tag name resolves through snapshot()
    assert _state(t) == tagged_state


def test_rollback_fails_loudly_after_vacuum_reclaimed_target(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    v1 = t.snapshot().version
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    t.compact()
    t.vacuum(retain_versions=1, stale_grace_sec=0)
    with pytest.raises((RuntimeError, FileNotFoundError)):
        t.rollback(v1)  # manifest or data files are gone -> loud failure


def test_rollback_across_pending_mor_deltas(spark, tmp_path):
    # high debt caps: the pending delta must SURVIVE as delta files (the
    # default ratio would fold a base-sized delta straight back down)
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), n_buckets=4, salt=2,
        mor_compact_ratio=100.0,
    )
    ev = events_df(spark, 400, n_repos=5, paths_per_repo=12)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    target_v = t.snapshot().version
    target_state = _state(t)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1, mode="mor")
    assert t.snapshot().delta_files  # head holds unfolded delta debt
    t.rollback(target_v)
    assert _state(t) == target_state
    assert t.snapshot().delta_files == []


def test_changelog_sees_rollback_as_revert_diff(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    target_v = t.snapshot().version
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    head_v = t.snapshot().version
    t.rollback(target_v)
    rb_v = t.snapshot().version
    # state at target == state at rollback -> empty changelog between them
    assert t.read_changes(target_v, rb_v).count() == 0
    fwd = t.read_changes(target_v, head_v).groupBy("change_op").count()
    rev = t.read_changes(head_v, rb_v).groupBy("change_op").count()
    f = {r["change_op"]: r["count"] for r in fwd.collect()}
    r = {r["change_op"]: r["count"] for r in rev.collect()}
    # the revert is the forward diff with insert/delete swapped
    assert r.get("delete", 0) == f.get("insert", 0)
    assert r.get("insert", 0) == f.get("delete", 0)
    assert r.get("update", 0) == f.get("update", 0)
    assert sum(r.values()) > 0


def test_streaming_reingest_after_rollback(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, 2, order="seq")
    run_tailer(t, event_dir, str(tmp_path / "ckpt1"), mode="replay",
               max_files_per_trigger=1)
    head_state = _state(t)
    hist = t.history()
    # roll back to the state after the first streamed segment
    t.rollback(hist[-2])
    assert _state(t) != head_state
    assert "stream_epoch_offset" not in t.snapshot().properties
    # a FRESH checkpoint re-tails the same binlog: the cleared epoch
    # offset re-derives from the restored fence, segment 1 re-applies
    # idempotently, segment 2 re-admits -> exact original head state
    run_tailer(t, event_dir, str(tmp_path / "ckpt2"), mode="replay",
               max_files_per_trigger=1)
    assert _state(t) == head_state


def test_tag_api_validates_and_drops(spark, tmp_path):
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    with pytest.raises(KeyError):
        t.tag("ghost", version=999)
    # a stale above-current v-file (crashed commit) is in history() but
    # was never committed — tagging it would pin state vacuum still
    # deletes (dangling tag), so it must be refused
    import json

    head = t.snapshot().version
    with open(t.log._vpath(head)) as f:
        stale = json.load(f)
    stale["version"] = head + 3
    with open(t.log._vpath(head + 3), "w") as f:
        json.dump(stale, f)
    with pytest.raises(KeyError, match="no committed"):
        t.tag("stale", version=head + 3)
    os.remove(t.log._vpath(head + 3))
    v = t.tag("a")
    assert t.tags() == {"a": v}
    assert t.snapshot("a").version == v
    t.drop_tag("a")
    assert t.tags() == {}
    with pytest.raises(KeyError, match="no tag"):
        t.snapshot("a")


def test_restore_markers_do_not_inherit(spark, tmp_path):
    """rolled_back_from/restored_version describe exactly one commit —
    descendants of a rollback must not report themselves as restores
    (ADVICE r4: _child copied them into every later merge/fence)."""
    t, ev = _mk(spark, tmp_path)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 200)), 0)
    target_v = t.snapshot().version
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    t.rollback(target_v)
    rb_v = t.snapshot().version
    # ordinary commits after the rollback: a merge and a compaction
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 1)
    t.compact()
    h = {r["version"]: r for r in t.describe_history().collect()}
    assert h[rb_v]["restored_version"] == str(target_v)
    for v, row in h.items():
        if v != rb_v:
            assert row["restored_version"] is None, (v, row["op"])
    assert "rolled_back_from" not in t.snapshot().properties


def _lineage(t):
    return sorted(
        map(
            tuple,
            t.metrics()
            .select("batch_id", "part_id", "rows_applied")
            .collect(),
        )
    )


def test_rollback_truncates_and_heals_metrics_lineage(spark, tmp_path):
    """Rollback un-commits batches above the restored fence; their
    lineage (per-batch files AND folded span rows) must go with them,
    or re-ingest under reused batch ids reports pre-rollback data
    (ADVICE r4).  Re-ingest with DIFFERENT batch boundaries must yield
    exactly the fresh lineage."""
    t, ev = _mk(spark, tmp_path)
    for b in range(4):
        lo, hi = b * 100, (b + 1) * 100
        t.apply_batch(
            canonicalize(ev.filter((F.col("seq") >= lo) & (F.col("seq") < hi))), b
        )
    target_v = t.history()[2]  # after batch 1 (create, b0, b1, b2, b3)
    golden = [r for r in _lineage(t) if r[0] <= 1]
    # fold everything into one span so the stale rows live inside it
    res = t.compact_metrics(keep_recent=0)
    assert res["consolidated"] == 4
    rb = t.rollback(target_v)
    assert t.snapshot().last_batch_id == 1
    assert rb["metrics_truncated"]["spans_truncated"] == 1
    # lineage now stops at the restored fence
    assert _lineage(t) == golden
    # re-ingest the same events under REUSED ids but different boundaries
    t.apply_batch(canonicalize(ev.filter((F.col("seq") >= 200) & (F.col("seq") < 230))), 2)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 230)), 3)
    fresh = [r for r in _lineage(t) if r[0] >= 2]
    assert sum(r[2] for r in fresh) == 200  # 200 re-ingested events
    # spans never overlap and heal is idempotent
    t.compact_metrics(keep_recent=0)
    assert [r for r in _lineage(t) if r[0] >= 2] == fresh


def test_compact_metrics_heals_reingest_crash_window(spark, tmp_path):
    """Crash window: rollback commits but dies before truncating the
    metrics.  A later re-ingest writes fresh batch files whose ids fall
    inside a stale span — heal rule 2 (mtime) must keep the FRESH files
    and truncate the stale span rows, never the reverse."""
    import time as _time

    t, ev = _mk(spark, tmp_path)
    for b in range(4):
        lo, hi = b * 100, (b + 1) * 100
        t.apply_batch(
            canonicalize(ev.filter((F.col("seq") >= lo) & (F.col("seq") < hi))), b
        )
    target_v = t.history()[2]
    golden = [r for r in _lineage(t) if r[0] <= 1]
    t.compact_metrics(keep_recent=0)
    # simulate the crash: the snapshot rolls back but truncation never ran
    t._truncate_metrics, orig = (lambda fence: {"skipped": True}), t._truncate_metrics
    try:
        t.rollback(target_v)
    finally:
        t._truncate_metrics = orig
    mdir = os.path.join(t.root, "metrics")
    assert any(n.startswith("span-") and n.endswith("00000003.parquet")
               for n in os.listdir(mdir))  # stale span survived the crash
    _time.sleep(1.1)  # mtime resolution: fresh files must sort after the span
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 200)), 2)
    # expected: exactly the fresh per-batch file's rows (metrics() right
    # now double-reports batch 2 — stale span rows + fresh file — which
    # is precisely what the heal must resolve toward the fresh side)
    fresh = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(mdir, "batch-00000002.parquet"))
            .select("batch_id", "part_id", "rows_applied")
            .collect(),
        )
    )
    heal = t.compact_metrics(keep_recent=256)
    assert [r for r in _lineage(t) if r[0] <= 1] == golden
    assert [r for r in _lineage(t) if r[0] >= 2] == fresh
    assert heal == {"consolidated": 0, "healed": 0}  # nothing else to do
