"""Physical-plan assertions: the optimizations SURVEY §4 claims are
"built-in" must actually show up in the plans — pushed filters, pruned
schemas, broadcast joins, no Python UDFs in JVM-only pipelines.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY
from polygon_io_data_ingestion_pipeline_spark.sources import table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = REGISTRY["filter_project_pushdown"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    # quantity predicate is pushable; shipdate range too
    assert "GreaterThan(l_quantity" in plan
    assert "IsNotNull(l_shipdate)" in plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = plan_of(REGISTRY["tpch_q05_local_supplier_volume"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    plan10 = plan_of(REGISTRY["tpch_q10_returned_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan10


def test_no_python_udfs_in_jvm_pipelines(spark, sf_dir):
    """Everything except the explicitly Arrow-batched operators must stay
    JVM-side: no BatchEvalPython / ArrowEvalPython stages."""
    offenders = []
    for name, spec in REGISTRY.items():
        plan = plan_of(spec.fn(spark, sf_dir))
        if "EvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"Python in the hot path: {offenders}"


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(REGISTRY["topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_whole_stage_codegen_active(spark, sf_dir):
    df = REGISTRY["tpch_q01_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # `*(n)` prefixes mark whole-stage-codegen spans in the tree string
    assert "*(" in plan
