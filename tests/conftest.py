from __future__ import annotations

import pytest

import os

from multithreaded_mapreduce_library_spark.session import get_spark

# Default sf0.001 for speed; SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
# replicates the driver's correctness gate exactly.
SMOKE_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF
