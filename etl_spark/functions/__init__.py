from etl_spark.functions.hashing import content_sha256, key_bucket  # noqa: F401
from etl_spark.functions.lang import tag_lang  # noqa: F401
from etl_spark.functions.normalize import normalize_content  # noqa: F401
