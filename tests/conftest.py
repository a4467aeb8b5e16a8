from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from skrub_spark import get_session

    s = get_session(
        app_name="skrub_spark_tests", master="local[4]", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
