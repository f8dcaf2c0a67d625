from __future__ import annotations

import pytest

from maggma_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("maggma_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


import os

from hypothesis import HealthCheck, settings

settings.register_profile(
    "default", max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])
settings.register_profile(
    "soak", max_examples=200, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default"))
