from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from tstables_spark import get_spark

    s = get_spark("tstables_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.parity import duck_connect

    con = duck_connect(PARITY_SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return PARITY_SF_DIR
