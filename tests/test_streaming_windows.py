"""Streaming event-time operators (§2.9): windows, sessions, stream
dedup, rate source, and the JSONL event source."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_spark.fixtures import events_df, write_event_batches
from etl_spark.sources.events import read_event_stream
from etl_spark.streaming.windows import (
    dedup_within_watermark,
    rate_events,
    repo_session_bursts,
    throughput_by_window,
)


def _drain(df, name: str) -> list:
    """Run a bounded streaming query into a memory sink and collect."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if df.isStreaming and not _has_agg(df) else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    return spark.sql(f"select * from {name}").collect()


def _has_agg(df) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def _event_stream(spark, tmp_path, n=2000, **kw):
    d = str(tmp_path / "ev")
    write_event_batches(events_df(spark, n, **kw), d, 2)
    return read_event_stream(spark, d)


def test_tumbling_window_counts(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    rows = _drain(throughput_by_window(stream, window="1 minute"), "tumble1")
    assert rows
    total = sum(r["n_events"] for r in rows)
    assert total == 2000
    # fixture ts = epoch + seq seconds -> 2000s span = 34 windows
    starts = {r["window_start"] for r in rows}
    assert 30 <= len(starts) <= 35


def test_sliding_window_overlap(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    rows = _drain(
        throughput_by_window(stream, window="2 minutes", slide="1 minute"), "slide1"
    )
    # each event lands in 2 overlapping windows
    assert sum(r["n_events"] for r in rows) == 4000


def test_session_bursts(spark, tmp_path):
    stream = _event_stream(spark, tmp_path, n=500, n_repos=3)
    rows = _drain(repo_session_bursts(stream, gap="30 seconds"), "sess1")
    assert rows
    # fixture events are 1s apart: every repo's events chain into session(s)
    assert all(r["n_events"] >= 1 for r in rows)
    assert {r["repo"] for r in rows} <= {"repo-0", "repo-1", "repo-2"}


def test_stream_dedup_within_watermark(spark, tmp_path):
    d = str(tmp_path / "ev")
    write_event_batches(
        events_df(spark, 1000), d, 2, duplicate_pct=30
    )  # ~30% re-delivered
    stream = read_event_stream(spark, d)
    rows = _drain(
        dedup_within_watermark(stream).groupBy().agg(F.count("*").alias("n")), "dd1"
    )
    assert rows[0]["n"] == 1000  # duplicates collapsed


def test_rate_source_shapes_events(spark):
    stream = rate_events(spark, rows_per_second=500)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("rate1")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.monotonic() + 20
        n = 0
        while time.monotonic() < deadline:
            n = spark.sql("select count(*) n from rate1").first()["n"]
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
        row = spark.sql("select * from rate1 limit 1").first()
        assert row["repo"].startswith("repo-") and row["path"].endswith(".py")
    finally:
        q.stop()


def test_jsonl_event_source_replay(spark, tmp_path):
    """JSONL drops replay to the same final state as parquet drops."""
    from etl_spark.catalog.table import LakeTable
    from etl_spark.streaming.tailer import run_tailer

    ev = events_df(spark, 500)
    jdir = tmp_path / "jsonl"
    os.makedirs(jdir)
    rows = ev.toJSON().collect()
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        with open(jdir / f"drop-{i:03d}.json", "w") as f:
            f.write("\n".join(chunk))
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    run_tailer(table, str(jdir), str(tmp_path / "ck"), mode="replay", fmt="json")

    pq_table = LakeTable.create(spark, str(tmp_path / "t2"), n_buckets=4)
    pdir = str(tmp_path / "pq")
    write_event_batches(ev, pdir, 2)
    run_tailer(pq_table, pdir, str(tmp_path / "ck2"), mode="replay")

    a = table.read().select("repo", "path", "content_sha")
    b = pq_table.read().select("repo", "path", "content_sha")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0
    # a clean stream must not litter quarantine/ with empty batch dirs
    assert not os.path.exists(str(tmp_path / "t" / "quarantine"))
    # standalone-consumer contract: the source DEFAULT drops rejects and
    # never exposes the corrupt-record column (only the CDC tailer opts
    # out to retain them in quarantine)
    from etl_spark.sources.events import read_event_stream

    plain = read_event_stream(spark, str(jdir), fmt="json")
    assert "_corrupt_record" not in plain.columns


def test_jsonl_malformed_lines_are_quarantined(spark, tmp_path):
    """A truncated/garbage line and a parseable-but-keyless object must
    be RETAINED in the table's quarantine directory (raw text + reason,
    counted in the sink stats), never become all-null event rows in the
    lake — and one poison line must not wedge or pollute the stream."""
    from etl_spark.catalog.table import LakeTable
    from etl_spark.streaming.tailer import run_tailer

    ev = events_df(spark, 100)
    jdir = tmp_path / "jsonl"
    os.makedirs(jdir)
    rows = ev.toJSON().collect()
    with open(jdir / "drop-000.json", "w") as f:
        f.write("\n".join(rows[:50]))
        f.write('\n{"seq": 9999, "truncated...')  # malformed line
        f.write('\n{"foo": "bar"}')  # parseable but keyless
        f.write("\n" + "\n".join(rows[50:]))
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _, sink = run_tailer(
        table, str(jdir), str(tmp_path / "ck"), mode="replay", fmt="json"
    )
    state = table.read()
    assert state.filter(F.col("repo").isNull() | F.col("path").isNull()).count() == 0
    # rejects landed in quarantine with raw text + reason, and the count
    # surfaced in the per-batch sink stats
    q = spark.read.parquet(str(tmp_path / "t" / "quarantine" / "*"))
    qrows = {(r["reason"], r["raw"]) for r in q.collect()}
    assert len(qrows) == 2
    reasons = {r for r, _ in qrows}
    assert reasons == {"malformed_json", "null_envelope"}
    assert any(raw.startswith('{"seq": 9999') for _, raw in qrows)
    assert sum(s.get("quarantined", 0) for s in sink.applied) == 2
    # all valid rows made it
    want = LakeTable.create(spark, str(tmp_path / "t2"), n_buckets=4)
    pdir = str(tmp_path / "pq")
    write_event_batches(ev, pdir, 1)
    run_tailer(want, pdir, str(tmp_path / "ck2"), mode="replay")
    a = state.select("repo", "path", "content_sha")
    b = want.read().select("repo", "path", "content_sha")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_window_plans_use_stateful_ops(spark, tmp_path):
    stream = _event_stream(spark, tmp_path, n=200)
    w = throughput_by_window(stream)
    plan = w._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
