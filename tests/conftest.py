from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oraaud_kafka_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_CORRECTNESS = os.environ.get(
    "SPARK_GRAFT_CORRECTNESS_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="oraaud-kafka-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


class FakeGroupState:
    """Minimal GroupState stand-in for driving stateful monitor
    functions directly (the applyInPandasWithState fns in
    streaming/analytics.py) without a streaming query."""

    def __init__(self, value=None):
        self._v = value
        self.updated = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.updated = True
