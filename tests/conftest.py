import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tests run a small local[4] session — don't pre-touch a 16g bench heap
os.environ.setdefault("SPARK_GRAFT_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from slacken_spark.session import get_spark

    s = get_spark("slacken_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
