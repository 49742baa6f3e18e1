"""Token-budget mixture assembly: budgets never overflow, selection is
the seed-stable md5-order prefix, the two-level prefix sum equals the
single-window cumsum, and no shard key collapses parallelism."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.sampling import (
    token_budget_mixture,
)
from polygon_io_data_ingestion_pipeline_spark.operators.text import token_count
from polygon_io_data_ingestion_pipeline_spark.sources import table


def test_budgets_bind_and_never_overflow(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = token_budget_mixture(docs, {"src0": 800, "src1": 500}, default_budget=300)
    got = out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    budgets = {"src0": 800, "src1": 500}
    assert len(got) >= 3  # default-budget sources participate too
    for r in got:
        assert r["t"] <= budgets.get(r["source"], 300), r["source"]
        assert r["t"] > 0


def test_selection_is_the_md5_order_prefix(spark, sf_dir):
    """The kept set must equal the brute-force single-window cumsum
    prefix — proving the two-level shard decomposition is exact."""
    docs = table(spark, sf_dir, "documents")
    out = token_budget_mixture(docs, {"src0": 800}, default_budget=250, n_shards=7)
    pr = F.expr(
        "CAST(conv(substr(md5('mix0_' || CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    w = Window.partitionBy("source").orderBy(pr, "doc_id")
    brute = (
        docs.select("doc_id", "source", token_count("text").alias("n"))
        .withColumn("cum", F.sum("n").over(w))
        .withColumn(
            "budget",
            F.when(F.col("source") == "src0", F.lit(800)).otherwise(F.lit(250)),
        )
        .filter(F.col("cum") <= F.col("budget"))
    )
    got = {(r["doc_id"], r["cum_tokens"]) for r in out.collect()}
    want = {(r["doc_id"], r["cum"]) for r in brute.collect()}
    assert got == want


def test_deterministic_and_seed_sensitive(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in token_budget_mixture(docs, {}, default_budget=400).collect()}
    b = {r["doc_id"] for r in token_budget_mixture(docs, {}, default_budget=400).collect()}
    assert a == b
    c = {
        r["doc_id"]
        for r in token_budget_mixture(docs, {}, default_budget=400, seed="other").collect()
    }
    assert a != c
