import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from openmldb_spark.session import get_spark

    s = get_spark(app_name="openmldb_spark_tests", cpus=8)
    yield s
    s.stop()
