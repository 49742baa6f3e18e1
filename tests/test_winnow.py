"""Winnowing (rolling-hash) document fingerprints vs a pure-Python
oracle, plus the scheme's shared-substring guarantee."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.text import (
    WINNOW_B,
    WINNOW_M,
    rolling_hashes,
    winnow_sketch,
)


def py_winnow(text: str | None, k: int = 7, w: int = 4) -> list[int] | None:
    if text is None:
        return None
    hs = []
    for i in range(len(text) - k + 1):
        acc = 0
        for ch in text[i : i + k]:
            acc = (acc * WINNOW_B + ord(ch)) % WINNOW_M
        hs.append(acc)
    if not hs:
        return []
    sel = [min(hs[i : i + w]) for i in range(max(len(hs) - w + 1, 1))]
    return sorted(set(sel))


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "short",  # below k: no grams
    "",  # empty
    "aaaaaaaaaaaa",  # degenerate: one distinct gram
    None,  # null text
    "prefix junk THE SHARED RUN OF TEXT IS HERE and a suffix",
    "other doc entirely THE SHARED RUN OF TEXT IS HERE different tail",
    "exact7!",  # exactly k chars: one gram
]


def test_winnow_matches_python_oracle(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id int, text string")
    got = {
        r["doc_id"]: r["sk"]
        for r in df.select("doc_id", winnow_sketch("text").alias("sk")).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == py_winnow(t), (i, t)


def test_winnow_shared_run_guarantee(spark):
    """Docs sharing a run of >= w + k - 1 chars must share a fingerprint."""
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id int, text string")
    got = {
        r["doc_id"]: r["sk"]
        for r in df.select("doc_id", winnow_sketch("text").alias("sk")).collect()
    }
    assert set(got[5]) & set(got[6])  # the shared-run pair
    assert not set(got[0]) & set(got[3])  # unrelated docs


def test_rolling_hash_count(spark):
    df = spark.createDataFrame([(0, "abcdefghij")], "doc_id int, text string")
    (row,) = df.select(rolling_hashes("text", k=7).alias("h")).collect()
    assert len(row["h"]) == 10 - 7 + 1
