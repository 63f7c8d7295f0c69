import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from aqueducts_spark.session import session_builder

    spark = (
        session_builder("aqueducts-tests", master="local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"
