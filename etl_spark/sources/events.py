"""Sources: batch + streaming readers for change-event drops and tables.

The streaming source tails a directory of parquet (or JSONL) event-file
drops with a declared schema (never inferred — replay must be
deterministic).  ``maxFilesPerTrigger`` bounds micro-batch size in tail
mode; ``trigger(availableNow=True)`` drives bounded replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_spark.schemas import EVENT_SCHEMA


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet batch scan (driver testdata, lake files)."""
    return spark.read.parquet(path)


def read_event_batch(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    reader = spark.read.schema(EVENT_SCHEMA)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported event format: {fmt}")


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        # quarantine malformed lines instead of failing the stream
        return reader.option("mode", "PERMISSIVE").json(path)
    raise ValueError(f"unsupported event format: {fmt}")
