"""Near-duplicate corpus ingest: EDITED re-posts are rejected across
batches with history in the lake's signature table, exact duplicates
still drop, genuinely new docs pass, and replays are exactly-once."""

from __future__ import annotations

import json
import os

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    incremental_near_dedup,
)
from polygon_io_data_ingestion_pipeline_spark.streaming.corpus_stream import (
    start_corpus_ingest,
    write_corpus_batch_neardup,
)

BASE = (
    "the data in a table is the value of the row and the key for the "
    "batch while the line in a window is the part of the sort and the "
    "scan of the merge keeps the order of the spill stable in the run"
)
# an EDITED re-post: one word changed mid-text, a banner appended —
# different fingerprint, near-identical shingle set
EDITED = BASE.replace("stable", "steady") + " mirrored by example dot com"
FRESH = (
    "completely different material about rivers and mountains and the "
    "weather patterns of coastal regions with long winded descriptions "
    "of valleys and storms and tides and the seasons turning slowly"
)


def _shard(path, name, docs):
    with open(os.path.join(path, name), "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")


def _doc(doc_id, text):
    return {"doc_id": doc_id, "text": text, "lang": "en", "source": "web", "n_chars": len(text)}


def _drain(spark, src, lake, ckpt):
    q = start_corpus_ingest(
        spark, src, lake, ckpt, watermark_delay="10 minutes", near_dedup=True
    )
    q.awaitTermination(120)


def test_edited_reposts_rejected_across_batches(spark, tmp_path):
    src, lake, ckpt = (str(tmp_path / d) for d in ("src", "lake", "ckpt"))
    os.makedirs(src)

    _shard(src, "a.jsonl", [_doc(1, BASE)])
    _drain(spark, src, lake, ckpt)
    assert {r["doc_id"] for r in spark.read.parquet(lake).collect()} == {1}
    assert os.path.isdir(os.path.join(lake, "_signatures", "ingest_batch=0"))

    # batch 2: the edited re-post (new fingerprint — the exact-history
    # sink would ACCEPT it) plus a genuinely new doc
    _shard(src, "b.jsonl", [_doc(10, EDITED), _doc(11, FRESH)])
    _drain(spark, src, lake, ckpt)
    ids = {r["doc_id"] for r in spark.read.parquet(lake).collect()}
    assert ids == {1, 11}  # edited re-post rejected, fresh doc accepted

    # batch 3: an exact duplicate of batch 2's fresh doc — still caught
    _shard(src, "c.jsonl", [_doc(20, FRESH)])
    _drain(spark, src, lake, ckpt)
    assert {r["doc_id"] for r in spark.read.parquet(lake).collect()} == {1, 11}


def test_neardup_sink_replay_is_exactly_once(spark, tmp_path):
    lake = str(tmp_path / "lake")
    batch = spark.createDataFrame(
        [(1, BASE, "en", "web", "fp1", 40), (2, EDITED, "en", "web", "fp2", 41)],
        "doc_id long, text string, lang string, source string, fp string, n_tokens int",
    )
    write_corpus_batch_neardup(batch, 0, lake)
    ids1 = sorted(r["doc_id"] for r in spark.read.parquet(lake).collect())
    assert ids1 == [1]  # within-shard near-dup keeps the min id
    # committed replay: ledger short-circuits
    write_corpus_batch_neardup(batch, 0, lake)
    # torn replay: ledger line lost, overwrite regenerates identical rows
    os.remove(os.path.join(lake, "_committed_batches.json"))
    write_corpus_batch_neardup(batch, 0, lake)
    assert sorted(r["doc_id"] for r in spark.read.parquet(lake).collect()) == ids1
    sigs = spark.read.parquet(os.path.join(lake, "_signatures"))
    assert sorted(r["doc_id"] for r in sigs.collect()) == [1]  # delta excludes dropped


def test_incremental_near_dedup_operator_contract(spark):
    docs1 = spark.createDataFrame([(1, BASE), (2, FRESH)], "doc_id long, text string")
    novel1, sigs1 = incremental_near_dedup(docs1, None)
    assert {r["doc_id"] for r in novel1.collect()} == {1, 2}
    # the delta carries one signature row per novel doc
    assert sorted(r["doc_id"] for r in sigs1.collect()) == [1, 2]

    docs2 = spark.createDataFrame(
        [(30, EDITED), (31, FRESH + " x")], "doc_id long, text string"
    )
    novel2, sigs2 = incremental_near_dedup(docs2, sigs1)
    # edited BASE and lightly-padded FRESH both reject against history;
    # the signature delta is empty, so history appends nothing
    assert {r["doc_id"] for r in novel2.collect()} == set()
    assert sigs2.count() == 0


def test_neardup_sink_nfc_collapses_nfd_reencode(spark, tmp_path):
    """round 13: the near-dup sink with normalize_form='NFC' rejects an
    NFD re-encoding of an ALREADY-INGESTED page (minhash signatures
    computed over the canonical form match history exactly)."""
    import unicodedata

    lake = str(tmp_path / "lake")
    nfc = ("café münchen the data in a table is the value of the row "
           "and the key for the batch while the line in a window sorts")
    nfd = unicodedata.normalize("NFD", nfc)
    b0 = spark.createDataFrame(
        [(1, nfc, "s")], "doc_id long, text string, source string"
    )
    write_corpus_batch_neardup(b0, 0, lake, normalize_form="NFC")
    b1 = spark.createDataFrame(
        [(2, nfd, "s")], "doc_id long, text string, source string"
    )
    write_corpus_batch_neardup(b1, 1, lake, normalize_form="NFC")
    rows = spark.read.parquet(lake)
    assert [r["doc_id"] for r in rows.collect()] == [1]


def test_neardup_sink_enforces_setting_constancy(spark, tmp_path):
    """round-13 review finding: a later invocation that silently changes
    the tokenizer / Unicode form / k computes signatures that never
    match history — every near-dup of history would be re-admitted with
    no error anywhere.  The sink records its settings on the first
    batch and REFUSES a mismatched continuation."""
    import pytest as _pytest

    lake = str(tmp_path / "lake")
    b0 = spark.createDataFrame(
        [(1, BASE, "s")], "doc_id long, text string, source string"
    )
    write_corpus_batch_neardup(b0, 0, lake, normalize_form="NFC")
    b1 = spark.createDataFrame(
        [(2, FRESH, "s")], "doc_id long, text string, source string"
    )
    with _pytest.raises(ValueError, match="settings differ"):
        write_corpus_batch_neardup(b1, 1, lake)  # form silently dropped
    with _pytest.raises(ValueError, match="settings differ"):
        write_corpus_batch_neardup(b1, 1, lake, normalize_form="NFC", k=4)
    # the matching continuation proceeds
    write_corpus_batch_neardup(b1, 1, lake, normalize_form="NFC")
    ids = sorted(r["doc_id"] for r in spark.read.parquet(lake).collect())
    assert ids == [1, 2]
