import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "soak: multi-micro-batch streaming soak at sf0.1 (state/wall "
        "flatness across >=20 triggers)",
    )


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
