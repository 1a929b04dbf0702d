from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ehr_ner_spark.session import get_spark

    s = get_spark(
        app_name="ehr_ner_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra={"spark.sql.execution.arrow.maxRecordsPerBatch": "256"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """The test session is long-lived (unlike bench's one-query
    subprocesses): reclaim any operator-persisted intermediates so cached
    frames don't accumulate in executor storage across the suite."""
    yield
    from ehr_ner_spark.cache import release_all

    release_all()
