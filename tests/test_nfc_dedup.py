"""Round 13: Unicode-normalization option on the dedup seams.

NFC vs NFD variants of identical rendered text (decomposed Hangul and
accented Latin — macOS-originated crawl content ships NFD) previously
hashed and shingled differently, silently splitting duplicate classes
along normalization-form lines.  ``normalize_form='NFC'`` routes the
text through an Arrow-batched ``unicodedata.normalize`` pass
(text.unicode_normalized) before any fingerprint/shingle math.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_verified_pairs,
    shingle_set,
)
from polygon_io_data_ingestion_pipeline_spark.operators.text import (
    unicode_normalized,
)

NFC_TEXT = "café münchen 한국 the quick brown fox"
NFD_TEXT = unicodedata.normalize("NFD", NFC_TEXT)

# Han-dominant doc with an embedded decomposed-vs-composed Latin run —
# exercises the CHAR lane (unsegmented routing) honoring the form
CJK_NFC = "科学家发现海洋变暖的速度比想象的快café研究报告指出问题严重"
CJK_NFD = unicodedata.normalize("NFD", CJK_NFC)


def _docs(spark):
    rows = [(0, NFC_TEXT), (1, NFD_TEXT), (2, CJK_NFC), (3, CJK_NFD)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_forms_really_differ():
    assert NFC_TEXT != NFD_TEXT and CJK_NFC != CJK_NFD


def test_exact_duplicates_split_without_normalization(spark):
    out = exact_duplicates(_docs(spark)).collect()
    assert len(out) == 4 and all(r["dup_count"] == 1 for r in out)


def test_exact_duplicates_collapse_with_nfc(spark):
    out = sorted(
        exact_duplicates(_docs(spark), normalize_form="NFC").collect(),
        key=lambda r: r["canonical_id"],
    )
    assert [(r["canonical_id"], r["dup_count"]) for r in out] == [(0, 2), (2, 2)]


def test_nfc_composes_with_aggressive_normalization(spark):
    rows = [(0, NFC_TEXT + "!!"), (1, NFD_TEXT + " ??")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_duplicates(
        docs, normalized=True, normalize_form="NFC"
    ).collect()
    assert len(out) == 1 and out[0]["dup_count"] == 2


def test_word_lane_shingles_honor_the_form(spark):
    sh = shingle_set(_docs(spark), normalize_form="NFC")
    by_id = {}
    for r in sh.collect():
        by_id.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert by_id[0] == by_id[1]  # word lane: NFD == NFC after normalize
    # without the form they differ
    sh0 = shingle_set(_docs(spark))
    raw = {}
    for r in sh0.collect():
        raw.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert raw[0] != raw[1]


def test_char_lane_shingles_honor_the_form(spark):
    sh = shingle_set(_docs(spark), tokenizer="auto", normalize_form="NFC")
    by_id = {}
    for r in sh.collect():
        by_id.setdefault(r["doc_id"], set()).add(r["shingle"])
    # CJK docs route through char grams; the embedded Latin run must
    # gram identically once normalized
    assert by_id[2] == by_id[3]


def test_jaccard_finds_the_pair_only_with_the_form(spark):
    docs = _docs(spark)
    without = {
        (r["id1"], r["id2"])
        for r in jaccard_pairs(docs, threshold=0.9).collect()
    }
    with_form = {
        (r["id1"], r["id2"])
        for r in jaccard_pairs(
            docs, threshold=0.9, normalize_form="NFC"
        ).collect()
    }
    assert (0, 1) not in without
    assert (0, 1) in with_form


def test_lsh_verified_pairs_honor_the_form(spark):
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in lsh_verified_pairs(
            _docs(spark), threshold=0.9, normalize_form="NFC"
        ).collect()
    }
    assert got.get((0, 1)) == 1.0


def test_invalid_form_raises():
    with pytest.raises(ValueError, match="form must be one of"):
        unicode_normalized("text", form="NFX")


def test_null_text_passes_through(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, NFC_TEXT)], "doc_id long, text string"
    )
    out = docs.select(
        "doc_id", unicode_normalized("text").alias("t")
    ).collect()
    vals = {r["doc_id"]: r["t"] for r in out}
    assert vals[0] is None and vals[1] == NFC_TEXT


def test_incremental_dedup_honors_the_form(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )

    docs = _docs(spark)
    novel, delta = incremental_dedup(docs, None, normalize_form="NFC")
    # NFD twins collapse onto the min-id representative within the shard
    assert sorted(r["doc_id"] for r in novel.collect()) == [0, 2]
    assert delta.count() == 2
    # and the delta blocks the NFD form arriving in a LATER shard
    shard2 = spark.createDataFrame(
        [(10, NFD_TEXT)], "doc_id long, text string"
    )
    novel2, _ = incremental_dedup(shard2, delta, normalize_form="NFC")
    assert novel2.count() == 0


def test_simhash_honors_the_form(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        simhash,
    )

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash(_docs(spark), normalize_form="NFC").collect()
    }
    assert sigs[0] == sigs[1]
    raw = {
        r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()
    }
    assert raw[0] != raw[1]


def test_minhash_rejects_form_with_caller_shingles(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        minhash_signatures,
        shingle_set,
    )

    docs = _docs(spark)
    sh = shingle_set(docs)
    with pytest.raises(ValueError, match="normalize_form"):
        minhash_signatures(docs, shingles_df=sh, normalize_form="NFC")


def test_incremental_dedup_fp_col_conflict_raises(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )

    docs = _docs(spark).withColumn("fp", F.md5(F.lower(F.col("text"))))
    with pytest.raises(ValueError, match="fp_col"):
        incremental_dedup(docs, None, normalize_form="NFC", fp_col="fp")


def test_incremental_dedup_reuses_precomputed_fp(spark):
    import unicodedata as _ud

    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        unicode_normalized,
    )

    docs = _docs(spark).withColumn(
        "fp", F.md5(F.lower(unicode_normalized("text")))
    )
    novel, delta = incremental_dedup(docs, None, fp_col="fp")
    assert sorted(r["doc_id"] for r in novel.collect()) == [0, 2]
