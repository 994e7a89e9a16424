from __future__ import annotations

import pytest

from sfs3_kinesis_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sfs3-kinesis-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
