import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from gstools_core_spark.session import get_session

    spark = get_session(app_name="gstools-core-spark-tests", cores=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
