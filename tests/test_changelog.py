"""Incremental changelog read (CDC-out): ``LakeTable.read_changes``.

The invariant under test: for any two snapshots A <= B,
``state(A) + changes(A→B) == state(B)`` — applying the changelog's
insert/update/delete rows to the old live state reproduces the new live
state exactly.  Plus the scale property that carried-forward files are
never scanned, and that a pure compaction commit produces zero changes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df
from etl_spark.pipeline import canonicalize

STATE_COLS = ["repo", "path", "commit", "lang", "content", "content_sha"]


def _mk(spark, tmp_path, n=600):
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4, salt=2)
    ev = events_df(spark, n, n_repos=6, paths_per_repo=10, delete_pct=10)
    t.apply_batch(canonicalize(ev.filter(F.col("seq") < 300)), 0)
    v1 = t.snapshot().version
    t.apply_batch(canonicalize(ev.filter(F.col("seq") >= 300)), 1)
    v2 = t.snapshot().version
    return t, v1, v2


def _apply_changes(old_state, changes):
    """old live state + changelog -> new live state (pure DataFrame ops)."""
    touched = changes.select("repo", "path")
    kept = old_state.join(touched, ["repo", "path"], "left_anti")
    post = (
        changes.filter(F.col("change_op") != "delete")
        .select(*STATE_COLS)
    )
    return kept.select(*STATE_COLS).unionByName(post)


def test_changelog_reconstructs_new_state(spark, tmp_path):
    t, v1, v2 = _mk(spark, tmp_path)
    changes = t.read_changes(v1, v2)
    assert changes.count() > 0
    rebuilt = _apply_changes(t.read(version=v1), changes)
    new_state = t.read(version=v2).select(*STATE_COLS)
    assert rebuilt.exceptAll(new_state).count() == 0
    assert new_state.exceptAll(rebuilt).count() == 0


def test_changelog_op_semantics(spark, tmp_path):
    t, v1, v2 = _mk(spark, tmp_path)
    changes = t.read_changes(v1, v2).cache()
    old_keys = {
        (r["repo"], r["path"]) for r in t.read(version=v1).select("repo", "path").collect()
    }
    for r in changes.collect():
        key = (r["repo"], r["path"])
        if r["change_op"] == "insert":
            assert key not in old_keys
            assert r["content_sha"] is not None
        elif r["change_op"] == "update":
            assert key in old_keys
            assert r["pre_content_sha"] is not None
            assert r["content_sha"] is not None
        else:  # delete
            assert key in old_keys
            assert r["pre_content_sha"] is not None
    changes.unpersist()


def test_changelog_skips_carried_files(spark, tmp_path):
    # second batch touches ONE repo -> most buckets carried forward; the
    # diff must scan only the rewritten files, not the whole table
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=8)
    ev = events_df(spark, 500, n_repos=8, paths_per_repo=10, delete_pct=0)
    t.apply_batch(canonicalize(ev), 0)
    v1 = t.snapshot().version
    ev2 = events_df(
        spark, 40, n_repos=1, paths_per_repo=10, start_seq=500, delete_pct=0
    )
    t.apply_batch(canonicalize(ev2), 1)
    v2 = t.snapshot().version
    snap_a, snap_b = t.snapshot(v1), t.snapshot(v2)
    carried = {e.path for e in snap_a.files} & {e.path for e in snap_b.files}
    assert carried, "fixture must leave some buckets untouched"
    scanned = set(t.read_changes(v1, v2).inputFiles())
    for rel in carried:
        assert not any(p.endswith(rel) for p in scanned), (
            f"carried file {rel} was scanned"
        )


def test_compaction_commit_yields_zero_changes(spark, tmp_path):
    t, _v1, v2 = _mk(spark, tmp_path)
    t.compact()
    v3 = t.snapshot().version
    assert t.read_changes(v2, v3).count() == 0


def test_changelog_same_version_empty_and_bad_range_raises(spark, tmp_path):
    import pytest

    t, v1, _v2 = _mk(spark, tmp_path)
    assert t.read_changes(v1, v1).count() == 0
    with pytest.raises(ValueError):
        t.read_changes(_v2, v1)
