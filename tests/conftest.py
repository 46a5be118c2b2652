from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("MLDB_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mldb_spark.session import get_spark

    return get_spark("mldb_spark_tests")


@pytest.fixture(scope="session")
def duck():
    from mldb_spark.testing import duck_connection

    return duck_connection(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
