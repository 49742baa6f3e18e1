"""Hybrid RRF retrieval: query-vector parity with the document embedder,
fusion arithmetic, and single-list fallbacks."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.embed import feature_hash_embed
from polygon_io_data_ingestion_pipeline_spark.operators.search import (
    hybrid_topk_rrf,
    query_feature_hash_vector,
)

DOCS = [
    # doc 1: lexically AND semantically on-topic -> tops both lists
    (1, "spark shuffle stream spark shuffle stream spark shuffle"),
    # doc 2: lexical hit only (one query term, then off-vocab ballast)
    (2, "spark " + " ".join(f"w{i}" for i in range(30))),
    # docs 3+: off-topic ballast
    (3, " ".join(f"noise{i}" for i in range(25))),
    (4, " ".join(f"other{i}" for i in range(25))),
]


def test_query_vector_matches_document_embedder_exactly(spark):
    """The driver-side query embedding must be bit-identical to running
    feature_hash_embed on the same text — otherwise dense ranks drift
    from what the corpus side computes."""
    text = "spark shuffle stream"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    spark_vec = np.array(feature_hash_embed(df, dim=16).first()["embedding"])
    py_vec = np.array(query_feature_hash_vector(text.split(" "), 16))
    assert np.array_equal(spark_vec, py_vec)


def test_rrf_fuses_both_rankers(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = hybrid_topk_rrf(df, ["spark", "shuffle", "stream"], k=4, n_cand=4, dim=16)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 1 leads both lists -> fused score is exactly 2/(60+1)
    assert rows[1]["r_lex"] == 1 and rows[1]["r_dense"] == 1
    assert abs(rows[1]["rrf_score"] - round(2 / 61, 6)) < 1e-9
    # every fused score is the sum of its two reciprocal-rank terms
    for r in rows.values():
        want = (1 / (60 + r["r_lex"]) if r["r_lex"] else 0.0) + (
            1 / (60 + r["r_dense"]) if r["r_dense"] else 0.0
        )
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9
    # ordering: top-of-both beats everything else
    ordered = [r["doc_id"] for r in out.orderBy(F.desc("rrf_score"), "doc_id").collect()]
    assert ordered[0] == 1


def test_dense_only_docs_survive_with_null_lex_rank(spark):
    """Docs with NO query term can never be BM25 candidates but still
    rank in the dense list — they must survive fusion with a null
    lexical rank and a single-term score."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = hybrid_topk_rrf(df, ["spark", "shuffle", "stream"], k=4, n_cand=4, dim=16)
    rows = {r["doc_id"]: r for r in out.collect()}
    for off_topic in (3, 4):
        r = rows[off_topic]
        assert r["r_lex"] is None and r["r_dense"] is not None
        assert abs(r["rrf_score"] - round(1 / (60 + r["r_dense"]), 6)) < 1e-9
