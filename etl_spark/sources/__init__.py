from etl_spark.sources.events import (  # noqa: F401
    read_event_batch,
    read_event_stream,
    read_table,
)
