"""Shared SparkSession for the test suite.

Small local session (the driver benches separately at local[32]); UTC +
non-ANSI to match engine assumptions (plans/session.py RUNTIME_CONF).
"""

from __future__ import annotations

import pytest

from kafka_streams_plumber_spark.plans.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ksps-tests", master="local[4]", shuffle_partitions=4)
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"
