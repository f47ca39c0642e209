import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
# python workers unpickle classes defined in test modules by reference — the
# worker processes need the same sys.path as the driver
os.environ["PYTHONPATH"] = os.pathsep.join(
    [REPO, TESTS] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
)
for p in (REPO, TESTS):
    if p not in sys.path:
        sys.path.insert(0, p)

from storm_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("storm_spark_tests", cpus=8, driver_memory="8g")
    yield s


def sorted_rows(df):
    """Order-insensitive row comparison helper (the reference's multiset
    equality ``ms=``, ``testing.clj:497``)."""
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))
