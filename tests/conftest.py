from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_io_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Suite wall-clock budget (r13, VERDICT r12 Next #1): the external
# verify window cut the r12 suite off mid-run, so suite growth is a
# gate risk. A hard-failing budget assert would flake under hypervisor
# CPU steal (which routinely inflates wall 2-5x on this sandbox), so
# the budget is REPORTED, not enforced: sessionfinish prints the wall
# and flags when it exceeds the budget, and the line lands in any
# captured verify output for drift tracking.
SUITE_BUDGET_S = float(os.environ.get("SPARK_GRAFT_SUITE_BUDGET_S", "2100"))
_SUITE_T0 = None


def pytest_sessionstart(session):
    global _SUITE_T0
    import time

    _SUITE_T0 = time.monotonic()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    import time

    if _SUITE_T0 is None:
        return
    wall = time.monotonic() - _SUITE_T0
    flag = "OVER BUDGET" if wall > SUITE_BUDGET_S else "within budget"
    terminalreporter.write_line(
        f"suite wall-clock: {wall:.0f}s ({flag}: {SUITE_BUDGET_S:.0f}s; "
        "budget is reported, not enforced - see conftest)"
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="vector_io_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
