from __future__ import annotations

import os

import pytest

from big_data_streaming_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("bdss-tests")
    yield s


@pytest.fixture(autouse=True)
def _release_rank_pins():
    """Free global_order consistency pins between tests (ADVICE r6).

    The sampled path's persist must outlive the test's action, so the
    helper can't release it; test boundaries are the safe point. Keeps
    the 1000-test session's executor storage bounded instead of pinning
    one fact-sized cache per sampled call forever.
    """
    yield
    from big_data_streaming_spark.plans.rank import release_persisted

    release_persisted()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med() -> str:
    return SF_MED
