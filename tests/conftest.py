from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.config import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    cores = int(os.environ.get("ETL_SPARK_TEST_CPUS", "8"))
    s = get_spark("etl_spark-tests", cores=cores, shuffle_partitions=8)
    yield s
    s.stop()
