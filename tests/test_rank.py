"""Distributed rank transform: exact equality with the single-window
rank under ties, null exclusion, and no single-reducer data window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.rank import distributed_rank


def test_matches_global_rank_window_with_ties(spark):
    rows = [(i, v) for i, v in enumerate([5.0, 1.0, 3.0, 3.0, 2.0, 5.0, 3.0, None])]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["id"]: (r["rank"], r["pct_rank"]) for r in distributed_rank(df, "v", "id", n_buckets=3).collect()}
    want_df = (
        df.filter(F.col("v").isNotNull())
        .withColumn("rank", F.rank().over(Window.orderBy("v")))
        .withColumn("pct", F.round(F.percent_rank().over(Window.orderBy("v")), 6))
    )
    want = {r["id"]: (r["rank"], r["pct"]) for r in want_df.collect()}
    assert got == want
    assert 7 not in got  # null excluded


def test_scales_past_sketch_degeneracy(spark):
    # constant column: zero distinct cut points -> one bucket, still exact
    df = spark.createDataFrame([(i, 1.0) for i in range(10)], "id long, v double")
    got = distributed_rank(df, "v", "id").collect()
    assert all(r["rank"] == 1 and r["pct_rank"] == 0.0 for r in got)


def test_data_windows_are_bucket_partitioned(spark):
    """The only global window must run on the bucket-count frame, never
    the data: the data-ranking window is partitioned by bucket."""
    df = spark.createDataFrame([(i, float(i % 97)) for i in range(2000)], "id long, v double")
    out = distributed_rank(df, "v", "id", n_buckets=16)
    tree = out._jdf.queryExecution().executedPlan().toString()
    # exactly one SinglePartition exchange (the <=16-row offsets frame)
    assert tree.count("Exchange SinglePartition") == 1
    got = {r["id"]: r["rank"] for r in out.collect()}
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.rank().over(Window.orderBy("v"))).collect()
    }
    assert got == want


def test_ntile_matches_global_window_including_remainder(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.rank import (
        distributed_ntile,
    )

    # 23 rows into 5 tiles: remainder 3 -> tiles of 5,5,5,4,4
    rows = [(i, float((i * 7) % 13)) for i in range(23)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["id"]: r["tile"] for r in distributed_ntile(df, "v", "id", n_tiles=5, n_buckets=4).collect()}
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(5).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want
    sizes = sorted(
        (list(got.values()).count(t) for t in set(got.values())), reverse=True
    )
    assert sizes == [5, 5, 5, 4, 4]


def test_ntile_fewer_rows_than_tiles(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.rank import (
        distributed_ntile,
    )

    df = spark.createDataFrame([(1, 2.0), (2, 1.0)], "id long, v double")
    got = {r["id"]: r["tile"] for r in distributed_ntile(df, "v", "id", n_tiles=10).collect()}
    assert got == {2: 1, 1: 2}  # one row per tile, value order
