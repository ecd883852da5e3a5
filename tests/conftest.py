"""Shared pytest fixtures. The Spark session is session-scoped (JVM
startup ≈ 5 s); tests that need different parallelism spawn their own.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from anno_spark.session import get_spark

    s = get_spark(master="local[8]", shuffle_partitions=8, app_name="anno-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
