import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ankaflow_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def engine(spark):
    from ankaflow_spark.session import SparkEngine

    return SparkEngine(spark)


@pytest.fixture()
def sf_dir():
    return SF_DIR
