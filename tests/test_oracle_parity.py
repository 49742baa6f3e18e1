"""Every registered query must match its DuckDB oracle exactly —
this is a local replica of the driver's CORRECTNESS gate.

Runs at sf0.001 by default; set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
to replicate the driver's exact scale.
"""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY

from .oracle_util import compare

ORACLE_QUERIES = [name for name, spec in REGISTRY.items() if spec.oracle]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, spec.oracle, sf_dir, require_rows=True)
    assert ok, f"{name}: {msg}"
