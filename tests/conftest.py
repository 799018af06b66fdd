import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("ubw_spark-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def friend_df(spark):
    """The canonical 4-row fixture (FIXTURES.md §1; reference
    Models.scala:6-24, Sample01.scala:5-8)."""
    rows = [
        (1, "魔理沙", "小莎莎", 2333, 3),
        (2, "jilen", "jilen 酱", 30, 4),
        (3, "品神", "kerr", 28, 5),
        (4, "廖师虎", "shihu", None, 6),
    ]
    return spark.createDataFrame(
        rows, "id bigint, name string, nick string, age int, grade int"
    )
