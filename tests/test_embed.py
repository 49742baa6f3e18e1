"""Feature-hash embedder: unit norm, determinism, collision-noise sign
balance, hand-checked bucket math, and ANN-pipeline integration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.embed import (
    feature_hash_components,
    feature_hash_embed,
)


def _py_hash(w: str, dim: int) -> tuple[int, int]:
    import hashlib

    h = hashlib.md5(w.encode()).hexdigest()
    bucket = int(h[:8], 16) % dim
    sign = 1 if int(h[8], 16) % 2 == 0 else -1
    return bucket, sign


def test_components_match_pure_python(spark):
    texts = ["alpha beta beta gamma", "one two three four five six"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in feature_hash_components(df, dim=8).collect()}
    for i, t in enumerate(texts):
        expect = [0] * 8
        for w in t.split(" "):
            b, s = _py_hash(w, 8)
            expect[b] += s
        assert [got[i][f"s_{j}"] for j in range(8)] == expect


def test_unit_norm_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i} with shared vocabulary terms") for i in range(20)],
        "doc_id long, text string",
    )
    emb = feature_hash_embed(df, dim=16)
    rows = emb.collect()
    for r in rows:
        nrm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(nrm - 1.0) < 1e-12 or nrm == 0.0
    # determinism across partitionings
    again = {
        r["doc_id"]: r["embedding"]
        for r in feature_hash_embed(df.repartition(7), dim=16).collect()
    }
    for r in rows:
        assert again[r["doc_id"]] == r["embedding"]


def test_similar_docs_closer_than_different(spark):
    a = "the market opened higher on strong earnings and upbeat guidance"
    b = "the market opened higher on strong earnings and revised guidance"
    c = "penguins huddle through antarctic winters conserving shared warmth"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    emb = {r["doc_id"]: r["embedding"] for r in feature_hash_embed(df, dim=64).collect()}

    def cos(u, v):
        return sum(x * y for x, y in zip(u, v))

    assert cos(emb[0], emb[1]) > cos(emb[0], emb[2])
    assert cos(emb[0], emb[1]) > cos(emb[1], emb[2])


def test_feeds_ann_pipeline(spark):
    """The embedding column plugs straight into the cosine top-k path."""
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),
            (2, "unrelated words entirely different tokens"),
        ],
        "doc_id long, text string",
    )
    emb = feature_hash_embed(df, dim=32).withColumnRenamed("doc_id", "vec_id")
    top = brute_force_topk(emb, query_id=0, k=2, id_col="vec_id").collect()
    assert [r["vec_id"] for r in top][0] == 1  # nearest is the near-duplicate


def test_plan_is_single_partial_agg_no_udf(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        feature_hash_embed(df, dim=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # one shuffle: the doc_id agg


def test_text_to_ivf_index_end_to_end(spark, tmp_path):
    """The full no-external-model loop: corpus -> feature-hash embed ->
    materialized IVF index in the lake -> partition-pruned ANN query
    finds the planted near-duplicate first."""
    import json

    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    rows = [(i, f"document number {i} about topic {i % 5} with shared filler") for i in range(40)]
    rows.append((100, "document number 7 about topic 2 with shared filler"))  # near-dup of 7
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = feature_hash_embed(df, dim=32).withColumnRenamed("doc_id", "vec_id")

    path = str(tmp_path / "ivf")
    centroids = build_ivf_index(emb, path, nlist=4, stride=10)
    assert json.load(open(f"{path}/_codebook.json"))  # self-contained artifact

    qvec = emb.filter("vec_id = 7").collect()[0]["embedding"]
    top = ivf_topk_indexed(
        spark, path, centroids, list(qvec), k=3, nprobe=4, exclude_id=7
    ).collect()
    assert top[0]["vec_id"] == 100  # the planted near-duplicate
    assert top[0]["cos"] > 0.9
