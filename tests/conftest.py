"""Shared Spark session for the test suite + fast/slow tiering."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from aos_spark.session import get_spark

# VERDICT r11 "Next round" #3: the 731-test suite runs ~18-22 min — fine
# for round close-out, heavy for per-change feedback. Modules here (plus
# every test_independent_truth* replica wave) are auto-marked `slow`;
# `pytest -m "not slow"` is the ~4-min per-change tier, the bare full run
# stays the close-out gate. Chosen from measured per-module wall time
# (r12 durations log): these account for ~800 of the ~1050 serial
# seconds and are replica waves, multi-run invariance sweeps, plan-lock
# diffs, or e2e pipelines — close-out evidence, not per-change signal.
SLOW_MODULES = {
    "test_determinism",      # 3-run invariance sweeps (~99 s)
    "test_dedup",            # LSH/minhash e2e waves (~95 s)
    "test_sketches",         # CMS/HLL/quantile error sweeps (~87 s)
    "test_plan_properties",  # registry-wide plan-shape lock (~81 s)
    "test_r6_properties",    # property sweeps (~53 s)
    "test_pipeline",         # lifecycle e2e (~43 s)
    "test_streaming",        # streaming e2e (~41 s)
    "test_io_ops",           # source-cascade e2e (~36 s)
    "test_cluster",          # clustering waves (~26 s)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        stem = Path(str(item.fspath)).stem
        if stem in SLOW_MODULES or stem.startswith("test_independent_truth"):
            item.add_marker(pytest.mark.slow)


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
