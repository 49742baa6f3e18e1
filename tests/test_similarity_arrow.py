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
