import shutil

import pytest

from crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(8, app_name="crawler_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def store_dir(tmp_path):
    d = tmp_path / "snapshots"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
