"""Skew helpers produce identical results to naive plans; bucketed lake
joins skip the exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from polygon_io_data_ingestion_pipeline_spark.sources import table
from polygon_io_data_ingestion_pipeline_spark.sources.lake import write_lake_bucketed


def test_salted_aggregate_matches_naive(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    naive = {
        r["event_type"]: (round(r["total"], 6), r["rows"])
        for r in ev.groupBy("event_type")
        .agg(F.round(F.sum("value"), 6).alias("total"), F.count("*").alias("rows"))
        .collect()
    }
    salted = {
        r["event_type"]: (round(r["total"], 6), r["rows"])
        for r in salted_aggregate(
            ev,
            ["event_type"],
            partial_aggs={"s": F.sum("value"), "c": F.count("*")},
            merge_aggs={"total": F.round(F.sum("s"), 6), "rows": F.sum("c")},
            salt_n=8,
        ).collect()
    }
    assert naive == salted


def test_salted_join_matches_naive(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    naive = ev.join(dim, ["user_id"]).select("event_id", "user_events")
    salted = salted_broadcast_left(ev, dim, ["user_id"], salt_n=4).select(
        "event_id", "user_events"
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    bars = spark.createDataFrame(
        [(t, f"2024-01-0{d}T16:00:00", 100.0 + d) for t in ("AAA", "BBB") for d in range(1, 6)],
        "ticker string, dt string, close double",
    ).select("ticker", F.col("dt").cast("timestamp_ntz").alias("datetime"), "close")
    spark.sql("DROP TABLE IF EXISTS bars_a")
    spark.sql("DROP TABLE IF EXISTS bars_b")
    write_lake_bucketed(bars, "bars_a", buckets=4, path=str(tmp_path / "a"))
    write_lake_bucketed(bars, "bars_b", buckets=4, path=str(tmp_path / "b"))

    a, b = spark.table("bars_a"), spark.table("bars_b").withColumnRenamed("close", "close_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # v1 bucketing removes the shuffle when the join keys equal the
        # bucket key (per-ticker joins — the lake's hot pattern)
        joined = a.join(b.withColumnRenamed("datetime", "dt_b"), ["ticker"])
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
