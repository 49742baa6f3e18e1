from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polygon_io_data_ingestion_pipeline_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# Modules dominated by inherently slow work — streaming drains/restarts,
# recall-floor measurements, Hypothesis property models, and the
# full-registry sweeps (oracle parity, plan linter).  Centrally marked
# ``slow`` so the dev fast lane (``pytest -m "not slow"``, <5 min) skips
# them while the default ``pytest tests/`` still runs everything.
SLOW_MODULES = {
    "test_oracle_parity",
    "test_plan_quality",
    "test_archive_property",
    "test_ivf",
    "test_ivf_rebalance",
    "test_pq",
    "test_neardup_recall",
    "test_knn_join_recall",
    "test_minute_path",
    "test_series_cli",
    "test_zorder_lake",
    "test_diff_property",
    "test_merge_property",
    "test_funnel",
    "test_funnel_stream",
    "test_pagerank",
    "test_join_stream",
    "test_windowed_stream",
    "test_streaming_pipeline",
    "test_drift_stream",
    "test_sessionize_stream",
    "test_ewma_stream",
    "test_corpus_stream",
    "test_corpus_exact_history",
    "test_corpus_index_stream",
    "test_ingest_lake",
    "test_compact_lake",
    "test_rollup_stream",
    "test_corpus_neardup_stream",
    "test_superset_claims",
    "test_lake_lease",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.purebasename in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
