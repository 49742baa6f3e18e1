"""Correlated subqueries must decorrelate to joins, not per-row probes.

Catalyst rewrites EXISTS / NOT EXISTS / correlated scalar subqueries
into semi/anti/aggregate joins.  These tests pin that the three TPC-H
subquery-family registry queries actually plan that way — a correlated
subquery executed as a nested loop over a 100 TB fact table would be a
scale-killer, so the physical shape IS the contract here (values are
covered by the in-repo oracle parity suite).
"""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_exists_becomes_semi_join(spark):
    plan = _plan(spark, "tpch_q04_priority_exists")
    assert "LeftSemi" in plan, plan
    # Decorrelated means NO per-row subquery execution node remains.
    assert "Subquery" not in plan, plan


def test_not_exists_becomes_anti_join(spark):
    plan = _plan(spark, "tpch_q22_idle_balance")
    assert "LeftAnti" in plan, plan


def test_scalar_subquery_becomes_aggregate_join(spark):
    plan = _plan(spark, "tpch_q17_small_quantity_revenue")
    # The per-part average is ONE hash aggregate joined back, and the
    # brand dimension broadcasts.
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    rows = REGISTRY["tpch_q17_small_quantity_revenue"].fn(spark, SF).collect()
    assert len(rows) == 1 and rows[0]["avg_yearly"] is not None
