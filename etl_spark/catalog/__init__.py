from etl_spark.catalog.snapshot import FileEntry, Snapshot  # noqa: F401
from etl_spark.catalog.table import LakeTable  # noqa: F401
