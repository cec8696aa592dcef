from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cli_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_ORACLE = os.path.join(TESTDATA, "sf0.01")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cli_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
