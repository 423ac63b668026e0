import pytest


@pytest.fixture(scope="session")
def spark():
    from databatchprotectionservice_spark.plans import get_spark

    spark = get_spark(
        app_name="dbps-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
