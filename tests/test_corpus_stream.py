"""Streaming corpus ingest: JSONL shards -> fingerprint dedup ->
stateless quality gate -> parquet lake, exactly once across drains,
re-delivered shards, and a foreachBatch replay."""

from __future__ import annotations

import json
import os

from polygon_io_data_ingestion_pipeline_spark.streaming.corpus_stream import (
    start_corpus_ingest,
    write_corpus_batch,
)

GOOD_A = (
    "the data in a table is the value of the row and the key for the "
    "batch while the line in a window is the part of the sort"
)
GOOD_B = (
    "a scan of the table shows the key and the value where the row of "
    "the batch meets the line of the window in a sort of merge"
)


def _shard(path, name, docs):
    with open(os.path.join(path, name), "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")


def _doc(doc_id, text, source="web"):
    return {"doc_id": doc_id, "text": text, "lang": "en", "source": source, "n_chars": len(text)}


def _drain(spark, src, lake, ckpt):
    q = start_corpus_ingest(spark, src, lake, ckpt, watermark_delay="10 minutes")
    q.awaitTermination(120)


def test_corpus_stream_end_to_end(spark, tmp_path):
    src, lake, ckpt = (str(tmp_path / d) for d in ("src", "lake", "ckpt"))
    os.makedirs(src)

    # Shard 1: a good doc, an exact duplicate of it, and a junk doc.
    _shard(src, "a.jsonl", [_doc(1, GOOD_A), _doc(2, GOOD_A), _doc(3, "junk short")])
    _drain(spark, src, lake, ckpt)
    rows = {r["doc_id"]: r for r in spark.read.parquet(lake).collect()}
    assert set(rows) == {1}  # dup collapsed, junk gated
    assert rows[1]["fp"] is not None and rows[1]["n_tokens"] > 20

    # Shard 2: a NEW good doc plus a re-delivery of shard 1's content
    # under a new doc_id — the fingerprint dedup state must suppress it
    # across micro-batches/drains within the watermark horizon.
    _shard(src, "b.jsonl", [_doc(10, GOOD_B), _doc(11, GOOD_A)])
    _drain(spark, src, lake, ckpt)
    rows = {r["doc_id"] for r in spark.read.parquet(lake).collect()}
    assert rows == {1, 10}

    # Shard 3 arrives; a third drain picks up ONLY it (checkpoint: each
    # file read once, no re-processing of old shards).
    _shard(src, "c.jsonl", [_doc(20, GOOD_B + " extended with new words of the table")])
    _drain(spark, src, lake, ckpt)
    assert {r["doc_id"] for r in spark.read.parquet(lake).collect()} == {1, 10, 20}

    # Lake layout: batch-keyed (the idempotent exactly-once unit), then
    # source for pruned downstream scans; both surface as partition
    # columns on read.
    import glob as _glob

    assert _glob.glob(os.path.join(lake, "batch_id=*", "source=web"))
    read_cols = set(spark.read.parquet(lake).columns)
    assert {"batch_id", "source"} <= read_cols


def test_foreachbatch_replay_is_suppressed(spark, tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    df = spark.createDataFrame(
        [(1, "t", "en", "s", "fp1", 30)],
        "doc_id long, text string, lang string, source string, fp string, n_tokens long",
    )
    write_corpus_batch(df, 7, lake)
    n1 = spark.read.parquet(lake).count()
    # An at-least-once replay of the SAME batch id must be a no-op.
    write_corpus_batch(df, 7, lake)
    assert spark.read.parquet(lake).count() == n1 == 1
    # A new batch id appends.
    write_corpus_batch(df, 8, lake)
    assert spark.read.parquet(lake).count() == 2


def test_stream_gate_equals_batch_gate(spark, tmp_path):
    """The documents the stream accepts are exactly the batch
    quality_filter + exact-dedup survivors (first-arrival rep)."""
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.text import quality_filter
    from polygon_io_data_ingestion_pipeline_spark.sources import table

    src, lake, ckpt = (str(tmp_path / d) for d in ("src", "lake", "ckpt"))
    os.makedirs(src)
    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(120).collect()
    _shard(src, "all.jsonl", [
        {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"],
         "source": r["source"], "n_chars": r["n_chars"]} for r in docs
    ])
    _drain(spark, src, lake, ckpt)
    got = {r["doc_id"] for r in spark.read.parquet(lake).collect()}

    batch = spark.createDataFrame(docs)
    gated = quality_filter(batch, keep_cols=("text",)).filter(F.col("keep"))
    kept = gated.withColumn("fp", F.md5(F.lower(F.col("text"))))
    reps = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    want = {r["doc_id"] for r in reps.collect()}
    # Single ordered shard: stream first-arrival == batch min doc_id.
    assert got == want and len(got) > 0


def test_replay_after_lost_ledger_line_still_exactly_once(spark, tmp_path):
    """The crash window the ledger alone cannot close: output committed
    but the ledger line never landed. Because the output path is keyed
    by batch id and overwritten, the replay rewrites the same directory
    instead of double-appending."""
    import pandas as pd

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["x"], "lang": ["en"],
                      "source": ["web"], "fp": ["f"], "n_tokens": [25]})
    )
    write_corpus_batch(df, 7, lake)
    # Simulate the torn state: data committed, ledger lost.
    os.remove(os.path.join(lake, "_committed_batches.json"))
    write_corpus_batch(df, 7, lake)  # at-least-once replay
    assert spark.read.parquet(lake).count() == 1
