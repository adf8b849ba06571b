from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from calidad_del_aire_etl_spark.session import get_session

    s = get_session("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "oracle: DuckDB oracle-parity sweep (deselect with -m 'not oracle')"
    )
    config.addinivalue_line(
        "markers",
        "sf1: full-registry sf1 parity sweep (opt-in: pytest -m sf1; "
        "generates /tmp/sf1 via tools/gen_sf1.py if absent)",
    )
    config.addinivalue_line(
        "markers",
        "slow: heavyweight per-round gates (multi-build statistical "
        "invariants, full-plan sweeps, DAG end-to-ends; opt-in: "
        "pytest -m slow). VERDICT r14 #2: the default suite must fit "
        "the driver's pytest budget (~15 min); every operator these "
        "cover stays exercised in the default run by the sf0.001 "
        "oracle-parity sweep and at least one fast contract test.",
    )


def pytest_collection_modifyitems(config, items):
    # The sf1 sweep runs only when explicitly selected (-m sf1): it
    # sweeps 199 queries at ~6M lineitem / 50k docs and takes ~20-40
    # min wall — a per-round gate (VERDICT r12 #6), not a per-commit one.
    mexpr = config.getoption("-m") or ""
    if "sf1" not in mexpr:
        skip = pytest.mark.skip(reason="sf1 sweep is opt-in: pytest -m sf1")
        for item in items:
            if "sf1" in item.keywords:
                item.add_marker(skip)
    if "slow" not in mexpr:
        skip_slow = pytest.mark.skip(
            reason="per-round heavyweight gate — opt-in: pytest -m slow"
        )
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip_slow)
