"""Incremental view maintenance: after every refresh the view must
equal a full recompute over the table's live state — including views
grouped by a MUTABLE column (updates move rows between groups via
retract/apply) and tables written in merge-on-read mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df
from etl_spark.operators.incremental import IncrementalView
from etl_spark.pipeline import canonicalize


def _measures(c):
    return {"total_chars": F.coalesce(F.length(c("content")), F.lit(0)).cast("long")}


def _key(row):
    return tuple("" if v is None else str(v) for v in row)


def _full(table, group_cols):
    return sorted(
        (
            tuple(r)
            for r in table.read()
            .groupBy(*group_cols)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.coalesce(F.length(F.col("content")), F.lit(0)).cast("long")
                ).alias("total_chars"),
            )
            .collect()
        ),
        key=_key,
    )


def _view_rows(view):
    return sorted((tuple(r) for r in view.read().select("*").collect()), key=_key)


def _run(spark, tmp_path, group_cols, write_mode="cow", null_langs=False):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), n_buckets=4, salt=2,
        write_mode=write_mode, mor_compact_ratio=10.0,
    )
    view = IncrementalView(t, str(tmp_path / "view"), group_cols, _measures)
    ev = events_df(spark, 900, n_repos=5, paths_per_repo=10, delete_pct=10)
    if null_langs:
        # unmappable extension (deterministic per key) -> lang tags NULL
        # for those keys: exercises the NULL group through the null-safe
        # state merge
        ev = ev.withColumn(
            "path",
            F.when(
                F.length("path") % 2 == 0, F.concat("path", F.lit(".zz"))
            ).otherwise(F.col("path")),
        )
    modes = []
    for i in range(3):
        lo, hi = i * 300, (i + 1) * 300
        t.apply_batch(
            canonicalize(ev.filter((F.col("seq") >= lo) & (F.col("seq") < hi))), i
        )
        modes.append(view.refresh()["mode"])
        got, want = _view_rows(view), _full(t, group_cols)
        assert got == want, f"batch {i}: view != full recompute\n{got}\n{want}"
    assert modes[0] == "full" and set(modes[1:]) == {"incremental"}
    return view


def test_view_by_repo_tracks_full_recompute(spark, tmp_path):
    view = _run(spark, tmp_path, ["repo"])
    # idempotent: refreshing at the same version is a no-op
    assert view.refresh()["mode"] == "noop"


def test_view_by_mutable_group_column(spark, tmp_path):
    # lang can CHANGE on update: the retract side must use the pre-image
    # group or rows leak between groups
    _run(spark, tmp_path, ["lang"])


def test_view_by_nullable_group_column(spark, tmp_path):
    # a NULL group key must merge null-safely (NULL<=>NULL), never
    # duplicate the NULL-group row
    view = _run(spark, tmp_path, ["lang"], null_langs=True)
    langs = [r["lang"] for r in view.read().select("lang").collect()]
    assert None in langs, "fixture produced no NULL lang group"
    assert langs.count(None) == 1


def test_view_over_merge_on_read_table(spark, tmp_path):
    _run(spark, tmp_path, ["repo"], write_mode="mor")


def test_view_rebuilds_when_checkpoint_version_vacuumed(spark, tmp_path):
    view = _run(spark, tmp_path, ["repo"])
    t = view.table
    ev2 = events_df(spark, 200, n_repos=5, paths_per_repo=10, start_seq=900)
    t.apply_batch(canonicalize(ev2), 3)
    t.vacuum(retain_versions=1, stale_grace_sec=0)  # expires the view's checkpoint snapshot
    assert view.refresh()["mode"] == "rebuild"
    assert _view_rows(view) == _full(t, ["repo"])
    # and the next refresh is incremental again
    t.apply_batch(
        canonicalize(
            events_df(spark, 100, n_repos=5, paths_per_repo=10, start_seq=1100)
        ),
        4,
    )
    assert view.refresh()["mode"] == "incremental"
    assert _view_rows(view) == _full(t, ["repo"])


def test_view_measure_reading_key_column_and_decimal(spark, tmp_path):
    # measures over KEY columns (no pre_ image exists) and exact DECIMAL
    # sums must both survive the retract/apply path untruncated
    def measures(c):
        return {
            "path_chars": F.length(c("path")).cast("long"),
            "money": (F.length(c("content")) * F.lit(0.01)).cast("decimal(14,2)"),
        }

    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4, salt=2)
    view = IncrementalView(t, str(tmp_path / "view"), ["lang"], measures)
    ev = events_df(spark, 600, n_repos=5, paths_per_repo=10, delete_pct=10)
    for i in range(2):
        lo, hi = i * 300, (i + 1) * 300
        t.apply_batch(
            canonicalize(ev.filter((F.col("seq") >= lo) & (F.col("seq") < hi))), i
        )
        view.refresh()
        want = sorted(
            (
                tuple(r)
                for r in t.read()
                .groupBy("lang")
                .agg(
                    F.count("*").alias("n_rows"),
                    F.coalesce(
                        F.sum((F.length("content") * F.lit(0.01)).cast("decimal(14,2)")),
                        F.lit(0),
                    ).alias("money"),
                    F.coalesce(
                        F.sum(F.length("path").cast("long")), F.lit(0)
                    ).alias("path_chars"),
                )
                .select("lang", "n_rows", "money", "path_chars")
                .collect()
            ),
            key=_key,
        )
        got = sorted(
            (
                tuple(r)
                for r in view.read()
                .select("lang", "n_rows", "money", "path_chars")
                .collect()
            ),
            key=_key,
        )
        assert got == want, f"batch {i}"


def test_view_definition_change_is_rejected(spark, tmp_path):
    import pytest

    view = _run(spark, tmp_path, ["repo"])
    other = IncrementalView(
        view.table, view.root, ["lang"], _measures
    )
    with pytest.raises(ValueError, match="definition changed"):
        other.refresh()


def test_view_survives_compaction(spark, tmp_path):
    view = _run(spark, tmp_path, ["repo"])
    t = view.table
    t.compact()
    assert view.refresh()["mode"] == "incremental"
    assert _view_rows(view) == _full(t, ["repo"])


def test_view_tracks_rollback(spark, tmp_path):
    # a table rollback is just another changelog-visible transition: the
    # view consumes the revert diff incrementally and matches a full
    # recompute over the RESTORED state — no rebuild needed
    view = _run(spark, tmp_path, ["repo"])
    t = view.table
    hist = t.history()
    t.rollback(hist[-2])  # undo the last applied batch
    assert view.refresh()["mode"] == "incremental"
    assert _view_rows(view) == _full(t, ["repo"])


def test_view_maintained_inside_streaming_tailer(spark, tmp_path):
    """Views passed to the tailer refresh after every committed
    micro-batch (full build on the first, incremental after), so
    downstream rollups lag the table by at most one trigger — and a
    crash-resumed stream heals the view through the changelog."""
    from etl_spark.fixtures import write_event_batches
    from etl_spark.streaming.tailer import run_tailer

    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=4, salt=2)
    view = IncrementalView(t, str(tmp_path / "view"), ["repo"], _measures)
    ev = events_df(spark, 600, n_repos=5, paths_per_repo=10, delete_pct=10)
    event_dir = str(tmp_path / "events")
    write_event_batches(ev, event_dir, n_batches=3)
    _q, sink = run_tailer(
        t, event_dir, str(tmp_path / "ckpt"), mode="replay",
        max_files_per_trigger=1, views=[view],
    )
    applied = [s for s in sink.applied if not s.get("skipped")]
    assert [s["views"] for s in applied] == [
        ["full"], ["incremental"], ["incremental"]
    ]
    assert all(s["view_refresh_ms"] >= 0 for s in applied)
    assert _view_rows(view) == _full(t, ["repo"])
