"""Exact-history corpus sink: cross-batch dedup beyond the watermark
horizon with state in the lake, replay idempotency, and the end-to-end
exact_history drain."""

from __future__ import annotations

import json
import os

from polygon_io_data_ingestion_pipeline_spark.streaming.corpus_stream import (
    start_corpus_ingest,
    write_corpus_batch_exact,
)

SCHEMA = "doc_id long, text string, lang string, source string, fp string, n_tokens long"

GOOD_A = (
    "the data in a table is the value of the row and the key for the "
    "batch while the line in a window is the part of the sort"
)
GOOD_B = (
    "a scan of the table shows the key and the value where the row of "
    "the batch meets the line of the window in a sort of merge"
)


def _batch(spark, rows):
    import hashlib

    data = [
        (i, t, "en", "web", hashlib.md5(t.lower().encode()).hexdigest(), len(t.split()))
        for i, t in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_cross_batch_dedup_and_replay(spark, tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake)

    write_corpus_batch_exact(_batch(spark, [(1, GOOD_A)]), 0, lake)
    # Batch 1 re-delivers GOOD_A (past any stream watermark — the sink
    # must reject it against the lake) plus one new doc.
    write_corpus_batch_exact(_batch(spark, [(2, GOOD_A), (3, GOOD_B)]), 1, lake)
    rows = {r["doc_id"] for r in spark.read.parquet(lake).collect()}
    assert rows == {1, 3}

    # foreachBatch replay of batch 1 (ledger wiped, same input): must
    # regenerate the SAME rows — the history scan excludes the batch's
    # own partition, so the replay does not anti-join against itself.
    ledger = os.path.join(lake, "_committed_batches.json")
    with open(ledger, "w") as fh:
        fh.write(json.dumps({"batch_id": 0}) + "\n")
    write_corpus_batch_exact(_batch(spark, [(2, GOOD_A), (3, GOOD_B)]), 1, lake)
    rows = sorted(
        (r["doc_id"], r["fp"]) for r in spark.read.parquet(lake).collect()
    )
    assert [d for d, _ in rows] == [1, 3]

    # Committed-batch ledger short-circuits a second replay entirely.
    before = os.path.getmtime(os.path.join(lake, "batch_id=1"))
    write_corpus_batch_exact(_batch(spark, [(2, GOOD_A)]), 1, lake)
    assert os.path.getmtime(os.path.join(lake, "batch_id=1")) == before


def test_exact_history_drain_end_to_end(spark, tmp_path):
    src, lake, ckpt = (str(tmp_path / d) for d in ("src", "lake", "ckpt"))
    os.makedirs(src)

    def shard(name, docs):
        with open(os.path.join(src, name), "w") as fh:
            for doc_id, text in docs:
                fh.write(
                    json.dumps(
                        {
                            "doc_id": doc_id,
                            "text": text,
                            "lang": "en",
                            "source": "web",
                            "n_chars": len(text),
                        }
                    )
                    + "\n"
                )

    def drain():
        q = start_corpus_ingest(spark, src, lake, ckpt, exact_history=True)
        q.awaitTermination(120)

    shard("a.jsonl", [(1, GOOD_A)])
    drain()
    # Second drain is a separate query run: in-stream dedup state does
    # not carry over, so only the lake history can reject the replay.
    shard("b.jsonl", [(2, GOOD_A), (3, GOOD_B)])
    drain()
    assert {r["doc_id"] for r in spark.read.parquet(lake).collect()} == {1, 3}


def test_all_duplicate_batch_leaves_history_readable(spark, tmp_path):
    """A batch rejected in FULL writes an empty partition dir; later
    batches must still read history without schema-inference failure,
    and the duplicate must stay rejected."""
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    write_corpus_batch_exact(_batch(spark, [(1, GOOD_A)]), 0, lake)
    write_corpus_batch_exact(_batch(spark, [(2, GOOD_A)]), 1, lake)  # all dups
    write_corpus_batch_exact(_batch(spark, [(3, GOOD_B), (4, GOOD_A)]), 2, lake)
    rows = sorted(r["doc_id"] for r in spark.read.parquet(lake).collect())
    assert rows == [1, 3]
