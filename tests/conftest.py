from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark.session import get_spark  # noqa: E402


# Module-scoped, not session-scoped: the suite grew past the point where
# one shared local[4] context survives it — every test file persists stage
# tables / link states, and the accumulated storage plus broadcast churn
# eventually starves the G1 GC locker mid-suite (observed 2026-08-19:
# JVM death ~160 tests in, everything after failing with
# ConnectionRefused). A fresh context per file frees the previous file's
# caches at stop() and bounds the pressure; the stage caches key on
# applicationId, so they drop stale entries across restarts.
@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="blink_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    return duckdb.connect()
