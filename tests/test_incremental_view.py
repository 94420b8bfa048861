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


def _full(table, group_cols):
    return sorted(
        map(
            tuple,
            table.read()
            .groupBy(*group_cols)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.coalesce(F.length(F.col("content")), F.lit(0)).cast("long")
                ).alias("total_chars"),
            )
            .collect(),
        )
    )


def _view_rows(view):
    return sorted(map(tuple, view.read().select("*").collect()))


def _run(spark, tmp_path, group_cols, write_mode="cow"):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), n_buckets=4, salt=2,
        write_mode=write_mode, mor_compact_ratio=10.0,
    )
    view = IncrementalView(t, str(tmp_path / "view"), group_cols, _measures)
    ev = events_df(spark, 900, n_repos=5, paths_per_repo=10, delete_pct=10)
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


def test_view_over_merge_on_read_table(spark, tmp_path):
    _run(spark, tmp_path, ["repo"], write_mode="mor")


def test_view_survives_compaction(spark, tmp_path):
    view = _run(spark, tmp_path, ["repo"])
    t = view.table
    t.compact()
    assert view.refresh()["mode"] == "incremental"
    assert _view_rows(view) == _full(t, ["repo"])
