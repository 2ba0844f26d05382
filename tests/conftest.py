import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adavnceseo_crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_catalog(spark, tmp_path):
    from adavnceseo_crawler_spark.catalog import SnapshotCatalog

    return SnapshotCatalog(spark, str(tmp_path / "warehouse"))
