from __future__ import annotations

import pytest

from deepdoctection_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dd_spark_tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_parity() -> str:
    return "/root/testdata/sf0.01"
