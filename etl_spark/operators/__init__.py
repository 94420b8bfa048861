from etl_spark.operators.lww import lww_latest  # noqa: F401
from etl_spark.operators.watermark import batch_high_watermarks, merge_watermarks  # noqa: F401
