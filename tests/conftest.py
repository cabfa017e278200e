from __future__ import annotations

import pytest

import hypo
from demo_apache_flink_streaming_mode_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    # load the requested hypothesis profile BEFORE test modules import,
    # so module-level hypo.budget(...) decorators bind to it (the
    # hypothesis plugin itself loads profiles too late for that)
    prof = config.getoption("--hypothesis-profile", default=None)
    if prof:
        hypo.activate(prof)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
