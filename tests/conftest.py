"""Shared Spark session for the test suite."""

from __future__ import annotations

import os

import pytest

from aos_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("aos-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    # AOS_TEST_SF_DIR is a DIAGNOSTIC override (e.g. point the
    # independent-truth replicas at sf0.01 to exercise tie-richer data);
    # some fixture-count assertions only hold at the sf0.001 default.
    return os.environ.get("AOS_TEST_SF_DIR", "/root/testdata/sf0.001")
