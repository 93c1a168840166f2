from __future__ import annotations

import os

import pytest

from espkinesis_spark.session import get_spark

# default sf0.001 for fast iteration; ESPK_TEST_SF_DIR=/root/testdata/sf0.01
# runs the identical suite at the driver gate's scale factor
SF_DIR = os.environ.get("ESPK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="espkinesis_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
