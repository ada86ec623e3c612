import os

import pytest

SF_DIR = os.environ.get("WVLET_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = os.environ.get("WVLET_TEST_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    import tempfile

    warehouse = tempfile.mkdtemp(prefix="wv_warehouse_")
    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.warehouse.dir", warehouse)
        .appName("wvlet_spark-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def ws(spark):
    from wvlet_spark import WvletSession

    return WvletSession(spark, table_dir=SF_DIR, file_base=os.path.join(
        os.path.dirname(__file__), "fixtures"))


@pytest.fixture(scope="session")
def duck():
    from wvlet_spark.oracle import duckdb_connect

    return duckdb_connect(SF_DIR)
