"""Shared Spark session for the test suite."""

from __future__ import annotations

import pytest

from aos_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("aos-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
