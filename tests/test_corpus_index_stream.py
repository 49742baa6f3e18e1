"""Streaming ANN maintenance: ingest -> dedup -> gate -> lake -> embed ->
searchable IVF index as ONE pipeline. Docs accepted in batch k must be
retrievable via ivf_topk_indexed after batch k commits; replays must not
duplicate index rows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.embed import feature_hash_embed
from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
    ivf_topk_indexed,
    read_ivf_codebook,
)
from polygon_io_data_ingestion_pipeline_spark.streaming.corpus_stream import (
    start_corpus_ingest_indexed,
    write_corpus_batch_indexed,
)

GOOD_A = (
    "the data in a table is the value of the row and the key for the "
    "batch while the line in a window is the part of the sort"
)
GOOD_B = (
    "a scan of the table shows the key and the value where the row of "
    "the batch meets the line of the window in a sort of merge"
)
GOOD_C = (
    "the merge of the sorted run with the spill file keeps the key order "
    "of the batch so the window over the table stays stable in the scan"
)


def _shard(path, name, docs):
    with open(os.path.join(path, name), "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")


def _doc(doc_id, text, source="web"):
    return {"doc_id": doc_id, "text": text, "lang": "en", "source": source, "n_chars": len(text)}


def _drain(spark, src, lake, idx, ckpt):
    q = start_corpus_ingest_indexed(
        spark, src, lake, idx, ckpt, watermark_delay="10 minutes", dim=16, nlist=2
    )
    q.awaitTermination(120)


def _qvec(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return [float(v) for v in feature_hash_embed(df, dim=16).first()["embedding"]]


def _topk_ids(spark, idx, text, k=3):
    cb = read_ivf_codebook(idx)
    return [
        r["doc_id"]
        for r in ivf_topk_indexed(
            spark, idx, cb, _qvec(spark, text), k=k, nprobe=2, id_col="doc_id"
        ).collect()
    ]


def test_streamed_docs_become_searchable_per_batch(spark, tmp_path):
    src, lake, idx, ckpt = (str(tmp_path / d) for d in ("src", "lake", "idx", "ckpt"))
    os.makedirs(src)

    # batch 1: two good docs (plus a dup and junk that must NOT be indexed)
    _shard(src, "a.jsonl", [_doc(1, GOOD_A), _doc(2, GOOD_A), _doc(3, "junk short")])
    _drain(spark, src, lake, idx, ckpt)
    assert os.path.exists(os.path.join(idx, "_codebook.json"))
    indexed = {r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert indexed == {1}
    # the accepted doc is retrievable by its own content, immediately
    assert _topk_ids(spark, idx, GOOD_A, k=1) == [1]

    # batch 2: a new doc joins the SAME index (frozen codebook append path)
    _shard(src, "b.jsonl", [_doc(10, GOOD_B)])
    _drain(spark, src, lake, idx, ckpt)
    indexed = {r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert indexed == {1, 10}
    assert _topk_ids(spark, idx, GOOD_B, k=1) == [10]
    # earlier batches remain retrievable
    assert _topk_ids(spark, idx, GOOD_A, k=1) == [1]

    # batch 3
    _shard(src, "c.jsonl", [_doc(20, GOOD_C)])
    _drain(spark, src, lake, idx, ckpt)
    assert _topk_ids(spark, idx, GOOD_C, k=1) == [20]

    # index layout: batch-keyed then list-keyed -> partition pruning on
    # list_id still applies (any partition level prunes)
    import glob as _glob

    assert _glob.glob(os.path.join(idx, "ingest_batch=*", "list_id=*"))


def test_index_replay_is_idempotent(spark, tmp_path):
    lake, idx = str(tmp_path / "lake"), str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(1, GOOD_A, "en", "web", "fp1", 25), (2, GOOD_B, "en", "web", "fp2", 25)],
        "doc_id long, text string, lang string, source string, fp string, n_tokens int",
    )
    write_corpus_batch_indexed(batch, 0, lake, idx, dim=16, nlist=2)
    rows1 = sorted(
        (r["doc_id"], r["ingest_batch"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    )
    cb1 = read_ivf_codebook(idx)

    # foreachBatch replay: same batch id re-delivered after a restart
    write_corpus_batch_indexed(batch, 0, lake, idx, dim=16, nlist=2)
    rows2 = sorted(
        (r["doc_id"], r["ingest_batch"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    )
    assert rows2 == rows1
    assert read_ivf_codebook(idx) == cb1

    # replay after a LOST ledger line (crash between write and ledger):
    # the overwrite regenerates identical rows, still exactly once
    os.remove(os.path.join(idx, "_indexed_batches.json"))
    write_corpus_batch_indexed(batch, 0, lake, idx, dim=16, nlist=2)
    rows3 = sorted(
        (r["doc_id"], r["ingest_batch"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    )
    assert rows3 == rows1


def _topk_ids_pq(spark, idx, text, k=3):
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        ivfpq_topk_rerank,
        read_ivfpq_meta,
    )

    cents, books = read_ivfpq_meta(idx)
    return [
        r["doc_id"]
        for r in ivfpq_topk_rerank(
            spark, idx, cents, books, _qvec(spark, text), k=k, nprobe=len(cents),
            refine=10, id_col="doc_id",
        ).collect()
    ]


def test_streamed_docs_become_searchable_per_batch_ivfpq(spark, tmp_path):
    """The compressed-index streaming sink: accepted docs land in the
    corpus lake AND an IVF+PQ index per batch; frozen-codebook encoding
    after bootstrap; replays do not duplicate index rows."""
    from polygon_io_data_ingestion_pipeline_spark.streaming.corpus_stream import (
        start_corpus_ingest_indexed_pq,
        write_corpus_batch_indexed_pq,
    )

    src, lake, idx, ckpt = (str(tmp_path / d) for d in ("src", "lake", "idx", "ckpt"))
    os.makedirs(src)

    def drain():
        q = start_corpus_ingest_indexed_pq(
            spark, src, lake, idx, ckpt, watermark_delay="10 minutes",
            dim=16, nlist=2, m=4, ncodes=4,
        )
        q.awaitTermination(120)

    # batch 1 bootstraps BOTH codebook levels; dup + junk are not indexed
    _shard(src, "a.jsonl", [_doc(1, GOOD_A), _doc(2, GOOD_A), _doc(3, "junk short")])
    drain()
    assert os.path.exists(os.path.join(idx, "_ivfpq.json"))
    rows = spark.read.parquet(idx).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert all(len(r["codes"]) == 4 for r in rows)  # m=4 PQ codes per row
    assert _topk_ids_pq(spark, idx, GOOD_A, k=1) == [1]

    # batch 2 encodes against the FROZEN books and appends
    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        read_ivfpq_meta,
    )

    meta1 = read_ivfpq_meta(idx)
    _shard(src, "b.jsonl", [_doc(10, GOOD_B)])
    drain()
    assert read_ivfpq_meta(idx) == meta1  # books unchanged by append
    assert {r["doc_id"] for r in spark.read.parquet(idx).collect()} == {1, 10}
    assert _topk_ids_pq(spark, idx, GOOD_B, k=1) == [10]
    assert _topk_ids_pq(spark, idx, GOOD_A, k=1) == [1]

    # foreachBatch replay of a committed batch id: no duplicate rows
    batch = spark.createDataFrame(
        [(10, GOOD_B, "en", "web", "fpX", 25)],
        "doc_id long, text string, lang string, source string, fp string, n_tokens int",
    )
    before = sorted(
        (r["doc_id"], r["ingest_batch"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    )
    write_corpus_batch_indexed_pq(batch, 1, lake, idx, dim=16, nlist=2, m=4, ncodes=4)
    after = sorted(
        (r["doc_id"], r["ingest_batch"], r["list_id"])
        for r in spark.read.parquet(idx).collect()
    )
    assert after == before


def test_stream_index_survives_append_and_rebalance(spark, tmp_path):
    """Interleaving the batch lifecycle with a streaming-built IVFPQ
    index must keep ONE partition depth and the batch ledger: append
    writes a fresh ingest_batch=append-* dir (never top-level lists),
    rebalance restages its rebuild under ingest_batch=rebuild-* and
    carries _indexed_batches.json across the swap — so the index stays
    readable, replays stay no-ops, and the next streaming batch lands
    cleanly."""
    import glob as _glob

    from polygon_io_data_ingestion_pipeline_spark.operators.similarity import (
        append_to_ivfpq_index,
        read_ivfpq_meta,
        rebalance_ivfpq_index,
    )
    from polygon_io_data_ingestion_pipeline_spark.streaming.corpus_stream import (
        start_corpus_ingest_indexed_pq,
        write_corpus_batch_indexed_pq,
    )

    src, lake, idx, ckpt = (str(tmp_path / d) for d in ("src", "lake", "idx", "ckpt"))
    os.makedirs(src)

    def drain():
        q = start_corpus_ingest_indexed_pq(
            spark, src, lake, idx, ckpt, watermark_delay="10 minutes",
            dim=16, nlist=2, m=4, ncodes=4,
        )
        q.awaitTermination(120)

    _shard(src, "a.jsonl", [_doc(1, GOOD_A)])
    drain()
    _shard(src, "b.jsonl", [_doc(10, GOOD_B)])
    drain()

    # batch append joins the stream layout instead of conflicting with it
    extra = feature_hash_embed(
        spark.createDataFrame([(77, GOOD_C)], "doc_id long, text string"), dim=16
    ).select("doc_id", "embedding")
    append_to_ivfpq_index(extra, idx, id_col="doc_id")
    assert not _glob.glob(os.path.join(idx, "list_id=*"))  # no mixed depth
    assert _glob.glob(os.path.join(idx, "ingest_batch=append-*", "list_id=*"))
    ids = {r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert ids == {1, 10, 77}

    # rebalance consolidates, keeps the stream depth AND the ledger
    res = rebalance_ivfpq_index(spark, idx, id_col="doc_id")
    assert res["rebuilt"]
    assert os.path.exists(os.path.join(idx, "_indexed_batches.json"))
    assert not _glob.glob(os.path.join(idx, "list_id=*"))
    assert _glob.glob(os.path.join(idx, "ingest_batch=rebuild-*", "list_id=*"))
    read_ivfpq_meta(idx)  # sidecar intact

    # a committed batch id replayed after the rebuild stays a no-op
    batch = spark.createDataFrame(
        [(10, GOOD_B, "en", "web", "fpX", 25)],
        "doc_id long, text string, lang string, source string, fp string, n_tokens int",
    )
    n_before = spark.read.parquet(idx).count()
    write_corpus_batch_indexed_pq(batch, 1, lake, idx, dim=16, nlist=2, m=4, ncodes=4)
    assert spark.read.parquet(idx).count() == n_before

    # and the NEXT streaming batch lands in the same structure
    _shard(src, "c.jsonl", [_doc(20, GOOD_C)])
    drain()
    ids = {r["doc_id"] for r in spark.read.parquet(idx).select("doc_id").collect()}
    assert 20 in ids
