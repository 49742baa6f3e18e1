"""The shared spread() rebalance: contract tests for the round-13
optimization seam (text.spread, used by the dedup family, NB, RRF,
span/line dedup, repetition stats and tpch_q01).

spread() exists to parallelize row-amplifying folds over corpora that
arrive in few dense files; its SCALE contract is that it disappears
when the scan already has enough splits — a repartition there would be
a pure pessimization at 100 TB.
"""

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.text import spread


def test_spread_rebalances_a_one_split_frame(spark):
    df = spark.range(0, 1000, 1, 1).select(F.col("id"))
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # content preserved exactly (a round-robin repartition, not a sample)
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_spread_is_identity_when_splits_suffice(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, target)
    out = spread(df)
    # no repartition inserted: the very same DataFrame comes back
    assert out is df
    df2 = spark.range(0, 1000, 1, target * 2)
    assert spread(df2) is df2
