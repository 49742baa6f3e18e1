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


def test_append_to_ivfpq_index_equals_one_shot_build(spark, sf_dir, tmp_path):
    """IVFPQ lifecycle parity with plain IVF: encoding new vectors
    against the FROZEN coarse+PQ codebooks and appending yields the
    SAME index contents (ids, list assignment, codes) as a one-shot
    build over the full corpus with those codebooks — and probes reach
    the appended rows without any rebuild."""
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk_rerank,
        read_ivfpq_meta,
        strided_centroids,
    )
    from polygon_io_data_ingestion_pipeline_spark.sources import table as _table

    emb = _table(spark, sf_dir, "embeddings")
    first, rest = emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1")

    cents = strided_centroids(emb, nlist=16, stride=31)
    books = S.pq_codebooks_strided(emb, m=4, ncodes=16, stride=31)
    idx = str(tmp_path / "ivfpq_inc")
    build_ivfpq_index(first, idx, centroids=cents, codebooks=books)
    append_to_ivfpq_index(rest, idx)

    ref = str(tmp_path / "ivfpq_ref")
    build_ivfpq_index(emb, ref, centroids=cents, codebooks=books)

    a = spark.read.parquet(idx).select("vec_id", "list_id", "codes")
    b = spark.read.parquet(ref).select("vec_id", "list_id", "codes")
    assert a.count() == emb.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # the sidecar still carries the frozen books
    got_cents, got_books = read_ivfpq_meta(idx)
    assert got_cents == cents and got_books == books

    # probing the incrementally-maintained index returns appended
    # (odd-id) neighbors identically to the one-shot index
    qvec = [float(v) for v in emb.filter("vec_id = 1").select("embedding").first()[0]]
    got = ivfpq_topk_rerank(
        spark, idx, cents, books, qvec, k=10, nprobe=4, refine=10, exclude_id=1
    ).collect()
    want = ivfpq_topk_rerank(
        spark, ref, cents, books, qvec, k=10, nprobe=4, refine=10, exclude_id=1
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    assert any(r["vec_id"] % 2 == 1 for r in got)  # appended rows reachable


def test_rebalance_ivfpq_index_retrains_both_levels(spark, sf_dir, tmp_path):
    """rebalance_ivfpq_index retrains coarse AND PQ codebooks on the
    index's own contents and swaps in place; the rebuilt index still
    answers exactly under full probe + re-rank, and the threshold
    short-circuit skips the rebuild."""
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        brute_force_topk,
        build_ivfpq_index,
        ivfpq_topk_rerank,
        read_ivfpq_meta,
        rebalance_ivfpq_index,
    )
    from polygon_io_data_ingestion_pipeline_spark.sources import table as _table

    emb = _table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq_reb")
    build_ivfpq_index(emb, idx, nlist=8, m=4, ncodes=16)
    old_cents, old_books = read_ivfpq_meta(idx)

    res = rebalance_ivfpq_index(spark, idx, max_train_rows=512, seed=11)
    assert res["rebuilt"]
    new_cents, new_books = read_ivfpq_meta(idx)
    assert new_cents != old_cents  # k-means retrain replaced strided books
    assert new_books != old_books
    assert len(new_cents) == 8 and len(new_books) == 4

    # no rows lost, and full probe + generous refine is still exact
    assert spark.read.parquet(idx).count() == emb.count()
    exact_ids = [r["vec_id"] for r in brute_force_topk(emb, query_id=0, k=10).collect()]
    qvec = [float(v) for v in emb.filter("vec_id = 0").select("embedding").first()[0]]
    full = ivfpq_topk_rerank(
        spark, idx, new_cents, new_books, qvec, k=10, nprobe=8, refine=50, exclude_id=0
    )
    assert [r["vec_id"] for r in full.collect()] == exact_ids

    # imbalance at/below threshold -> cheap no-op
    res2 = rebalance_ivfpq_index(spark, idx, rebalance_above=1e9)
    assert not res2["rebuilt"]
