import os

import pytest

SF_DIR = os.environ.get("DBQT_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dbqt_spark.session import get_spark

    s = get_spark(app_name="dbqt_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
