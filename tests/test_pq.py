"""Product quantization: encode shape/determinism, ADC vs exact recall
floors, and the shortlist+re-rank production path."""

from __future__ import annotations

import pytest

import polygon_io_data_ingestion_pipeline_spark.operators.similarity as S
from polygon_io_data_ingestion_pipeline_spark.sources.tables import table

SF = "/root/testdata/sf0.001"
QIDS = (0, 7, 42, 99)


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings")


def _recall(emb, books, qid, rerank=False, **kw):
    brute = {r["vec_id"] for r in S.brute_force_topk(emb, query_id=qid, k=10).collect()}
    fn = S.pq_topk_rerank if rerank else S.pq_topk
    got = {r["vec_id"] for r in fn(emb, books, query_id=qid, k=10, **kw).collect()}
    return len(got & brute) / 10


def test_encode_shape_and_determinism(emb):
    books = S.pq_codebooks_strided(emb, m=16)
    codes = S.pq_encode(emb, books)
    rows = codes.limit(5).collect()
    assert all(len(r["codes"]) == 16 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    again = {r["vec_id"]: r["codes"] for r in S.pq_encode(emb, books).limit(5).collect()}
    assert {r["vec_id"]: r["codes"] for r in rows} == again
    assert codes.count() == emb.count()


def test_adc_recall_floor(emb):
    """Raw ADC on isotropic random vectors is PQ's worst case; still
    must beat chance by a wide margin (measured 0.30-0.45 at pin time
    for strided and k-means codebooks, m=16)."""
    books = S.pq_codebooks_kmeans(emb, m=16)
    mean = sum(_recall(emb, books, q) for q in QIDS) / len(QIDS)
    assert mean >= 0.25, mean


def test_rerank_recovers_exact(emb):
    """ADC shortlist (k*refine) + exact cosine re-rank must return the
    exact top-k on the fixture corpus (measured recall 1.0)."""
    books = S.pq_codebooks_kmeans(emb, m=16)
    for q in QIDS:
        assert _recall(emb, books, q, rerank=True, refine=10) == 1.0


def test_bad_subspace_split_raises(emb):
    with pytest.raises(ValueError):
        S.pq_codebooks_strided(emb, m=5)  # 64 dims not divisible by 5


def test_ivfpq_index_recall_and_prunings(spark, sf_dir, tmp_path):
    """The combined IVF+PQ index: (a) self-contained lake artifact,
    (b) ADC shortlist pass reads codes but never the raw vectors
    (column pruning) from only the probed lists (partition pruning),
    (c) recall vs exact brute force stays useful at nprobe<nlist and
    approaches exact at nprobe=nlist."""
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        brute_force_topk,
        build_ivfpq_index,
        ivfpq_topk_rerank,
        read_ivfpq_meta,
    )
    from polygon_io_data_ingestion_pipeline_spark.sources import table

    emb = table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx, nlist=16, m=4, ncodes=16)
    cents, books = read_ivfpq_meta(idx)
    qvec = [float(v) for v in emb.filter("vec_id = 0").select("embedding").first()[0]]

    exact_ids = [r["vec_id"] for r in brute_force_topk(emb, query_id=0, k=10).collect()]

    # full probe + generous refine -> the exact answer
    full = ivfpq_topk_rerank(
        spark, idx, cents, books, qvec, k=10, nprobe=16, refine=50, exclude_id=0
    )
    assert [r["vec_id"] for r in full.collect()] == exact_ids

    # partial probe: partition-pruned, recall still useful
    part = ivfpq_topk_rerank(
        spark, idx, cents, books, qvec, k=10, nprobe=4, refine=10, exclude_id=0
    )
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    got = [r["vec_id"] for r in part.collect()]
    assert len(set(got) & set(exact_ids)) >= 5, (got, exact_ids)
