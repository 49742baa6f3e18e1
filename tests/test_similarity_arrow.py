"""Arrow fast path for cosine top-k must agree with the pure-expression
baseline (same neighbours, same rounded scores)."""

from __future__ import annotations

import numpy as np

from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
)
from polygon_io_data_ingestion_pipeline_spark.sources import table


def test_arrow_topk_matches_expression(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    a = brute_force_topk(emb, query_id=0, k=10).collect()
    b = brute_force_topk_arrow(emb, query_id=0, k=10).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    np.testing.assert_allclose(
        [r["cos"] for r in a], [r["cos"] for r in b], atol=2e-6
    )


def test_vec_dim_probe_skips_null_embeddings(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        _vec_dim,
        rp_lsh_buckets,
    )

    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0, 2.0]), (2, [0.5, -1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    # A null first row used to make the probe raise; it must skip to the
    # first non-null vector.
    assert _vec_dim(df, "embedding") == 3
    buckets = {r["vec_id"]: r["bucket"] for r in rp_lsh_buckets(df, n_planes=4).collect()}
    # A null vector degenerates to bucket 0 (every IF(null >= 0, ...)
    # takes the else branch) rather than crashing; any candidate pairs it
    # forms are dropped later by the null-propagating cosine verify.
    assert buckets[0] == 0
    assert buckets[1] is not None and buckets[2] is not None
