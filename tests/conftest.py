from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("FLUSS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from fluss_spark.session import get_spark

    s = get_spark("fluss_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_session(spark):
    # alias used by hypothesis-driven tests (function-scoped @given can't
    # take the fixture named 'spark' directly without re-entry issues)
    return spark
