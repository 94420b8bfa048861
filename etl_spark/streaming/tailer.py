"""The binlog tailer: streaming query wiring (readStream -> foreachBatch).

replay mode: trigger(availableNow=True) — drain everything currently in
the event directory, then stop (bounded, exactly-once, resumable).
tail mode:   processingTime trigger — continuous ingestion.

Resume: Spark's checkpoint tracks source offsets (which files were read
per batch id); the engine snapshot tracks which batch ids committed.
After a crash, replayed batches hit the fence and no-op.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

from etl_spark.catalog.table import LakeTable
from etl_spark.sources.events import read_event_stream
from etl_spark.streaming.sink import CdcSink


def run_tailer(
    table: LakeTable,
    event_dir: str,
    checkpoint_dir: str,
    mode: str = "replay",
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    delivery: str = "ordered",
    processing_interval: str = "5 seconds",
    await_termination: bool = True,
    nfc: bool = True,
    views: list | None = None,
    maintain_every: int = 0,
    maintain_kwargs: dict | None = None,
) -> tuple[StreamingQuery, CdcSink]:
    # drop_rejects=False: the CDC boundary retains malformed rows in the
    # table's quarantine/ (counted in sink stats) instead of the source's
    # default drop — the sink owns the reject policy here
    stream = read_event_stream(
        table.spark, event_dir, fmt=fmt,
        max_files_per_trigger=max_files_per_trigger, drop_rejects=False,
    )
    sink = CdcSink(
        table, delivery=delivery, nfc=nfc, checkpoint_dir=checkpoint_dir,
        views=views, maintain_every=maintain_every,
        maintain_kwargs=maintain_kwargs,
    )
    writer = (
        stream.writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if mode == "replay":
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    q = writer.start()
    if await_termination and mode == "replay":
        q.awaitTermination()
    return q, sink
