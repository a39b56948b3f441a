import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pypgcdc_spark.session import get_spark, tune_for_local_tests

    spark = get_spark("pypgcdc-tests", cpus=int(os.environ.get("TEST_CPUS", "4")))
    yield tune_for_local_tests(spark)
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
