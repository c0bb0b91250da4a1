import os

import pytest

from lanterndb_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lanterndb-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def small_world(spark):
    """The reference's 8-corner unit-cube fixture
    (lantern_hnsw/test/sql/utils/small_world_array.sql)."""
    rows = []
    for i in range(8):
        bits = [float(b) for b in format(i, "03b")]
        rows.append((format(i, "03b"), i % 2 == 0, bits))
    return spark.createDataFrame(rows, "id string, b boolean, v array<float>")
