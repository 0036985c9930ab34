import pytest


@pytest.fixture(scope="session")
def spark():
    from tbl_spark.session import get_spark
    s = get_spark(cores=8, shuffle_partitions=16, app_name="tbl_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
