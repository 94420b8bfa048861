"""Streaming event-time operators (SURVEY.md §2.9): windowed throughput
metrics, session bursts, watermark-bounded dedup, and the synthetic
rate source for load tests.

These run OVER the change stream (diagnostics / metrics); the merge
path itself deliberately keeps its state in the engine snapshot, not
the Spark state store (see streaming/sink.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.fixtures import TS_EPOCH


def throughput_by_window(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time window of
    per-op event counts.  The watermark bounds window state so a
    long-running tail never accumulates unbounded aggregation state."""
    w = (
        F.window("ts", window, slide)
        if slide is not None
        else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("op"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("repo").alias("approx_repos"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "approx_repos",
        )
    )


def repo_session_bursts(
    events: DataFrame, gap: str = "30 seconds", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-repo activity sessions: consecutive events closer than ``gap``
    collapse into one session row (burst detection for hot-repo
    promotion diagnostics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("repo"))
        .agg(F.count("*").alias("n_events"), F.max("seq").alias("max_seq"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "repo",
            "n_events",
            "max_seq",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Duplicate-delivery collapse on the stream itself: state for the
    (part_id, seq) key set is dropped once the watermark passes —
    bounded memory under at-least-once sources.  (The transactional
    sink is idempotent regardless; this trims redundant work early.)"""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["part_id", "seq"]
    )


def rate_events(
    spark: SparkSession, rows_per_second: int = 1000, n_parts: int = 4
) -> DataFrame:
    """Synthetic change-event stream from the rate source (load driver).

    Deterministic columns derived from the rate source's ``value`` with
    fixture-STYLE hashing (xxhash64 over salted seq) — deliberately a
    simplified shape, NOT byte-identical to ``fixtures.events_df`` (its
    op/commit/content derivations differ), so rate-driven load numbers
    are not directly comparable with batch-fixture replays."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    s = F.col("value")
    h = lambda salt: F.xxhash64(s, F.lit(42), F.lit(salt))  # noqa: E731
    return stream.select(
        s.alias("seq"),
        F.pmod(s, F.lit(n_parts)).cast("int").alias("part_id"),
        F.when(F.pmod(h(1), F.lit(100)) < 5, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.timestamp_seconds(F.lit(TS_EPOCH) + s).alias("ts"),
        F.concat(F.lit("repo-"), F.pmod(h(2), F.lit(20)).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), F.pmod(h(3), F.lit(500)).cast("string"), F.lit(".py")).alias(
            "path"
        ),
        F.substring(F.sha2(s.cast("string"), 256), 1, 40).alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.concat(F.lit("content v"), s.cast("string"), F.lit("\n")).alias("content"),
        F.lit(None).cast("map<string,string>").alias("extra"),
    )
