"""Sources: batch + streaming readers for change-event drops and tables.

The streaming source tails a directory of parquet (or JSONL) event-file
drops with a declared schema (never inferred — replay must be
deterministic).  ``maxFilesPerTrigger`` bounds micro-batch size in tail
mode; ``trigger(availableNow=True)`` drives bounded replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    if fmt == "parquet":
        reader = spark.readStream.schema(EVENT_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(path)
    if fmt == "json":
        # REAL quarantine: PERMISSIVE alone would turn a malformed line
        # into an all-null event row flowing straight into the merge —
        # capture the raw text in a corrupt-record column and drop rows
        # that failed to parse or lack the non-null envelope fields
        from pyspark.sql.types import StringType, StructField, StructType

        schema_q = StructType(
            list(EVENT_SCHEMA.fields)
            + [StructField("_corrupt_record", StringType(), True)]
        )
        reader = spark.readStream.schema(schema_q)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        df = (
            reader.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
        return (
            df.filter(
                F.col("_corrupt_record").isNull()
                & F.col("seq").isNotNull()
                & F.col("repo").isNotNull()
                & F.col("path").isNotNull()
                & F.col("op").isNotNull()
            )
            .drop("_corrupt_record")
        )
    raise ValueError(f"unsupported event format: {fmt}")
