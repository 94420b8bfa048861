from etl_spark.streaming.sink import CdcSink  # noqa: F401
from etl_spark.streaming.tailer import run_tailer  # noqa: F401
