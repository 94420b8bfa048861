"""Manifest bucket-span regression: output files must stay tightly
bucket-clustered batch over batch (wide spans would make every future
micro-batch rewrite nearly every file, destroying CoW pruning)."""

from __future__ import annotations

from etl_spark.catalog.table import LakeTable
from etl_spark.fixtures import events_df
from etl_spark.pipeline import canonicalize


def test_file_bucket_spans_stay_tight(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8, salt=4)
    for bid in range(3):
        ev = events_df(spark, 3000, seed=5, start_seq=bid * 3000, n_repos=12)
        t.apply_batch(ev, bid, canonicalizer=canonicalize)
    snap = t.snapshot()
    assert snap.files
    worst = max(len(e.buckets) for e in snap.files)
    # partitionBy("bucket") writes guarantee EXACTLY one bucket per file;
    # anything more means the exact-layout invariant regressed
    assert worst == 1, f"file claims {worst} buckets — clustering regressed"
    # and pruning still resolves single repos to a strict file subset
    pruned = [
        e
        for e in snap.files
        if set(t._bucket_of_repo(snap, "repo-3")) & set(e.buckets)
    ]
    assert 0 < len(pruned) < len(snap.files)


def test_table_stats_diagnostics(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    for bid in range(2):
        ev = events_df(spark, 2000, seed=9, start_seq=bid * 2000)
        t.apply_batch(ev, bid, canonicalizer=canonicalize)
    s = t.stats()
    assert s["rows_live"] > 0 and s["files"] > 0
    assert s["total_events_applied"] == 4000
    # CoW rewrote batch-0 keys during batch 1 -> amplification > 1
    assert s["write_amplification"] >= 1.0
    assert s["n_buckets_used"] <= 8 and s["watermarks"]
