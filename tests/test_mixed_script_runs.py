"""Round 13 (verdict ask #6): per-script-run routing for mixed-script
documents.

The dominance predicates route WHOLE documents, so a mostly-Latin page
with an embedded CJK paragraph below the 30% line kept whole-doc word
tokenization — the paragraph was ONE opaque token, and word shingling
cannot tell a one-character typo inside it from a wholly replaced
paragraph.  ``tokenizer='runs'`` (text.script_run_tokens /
script_run_shingles) splits the text into script runs, char-grams the
unsegmented runs in place and word-splits the rest.
"""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    shingle_set,
)
from polygon_io_data_ingestion_pipeline_spark.operators.text import (
    char_ngrams,
    script_run_tokens,
)

LATIN = ("market analysts said the quarterly report shows strong growth "
         "in all regions and the board expects the trend to continue")
CJK_PARA = "科学家发现海洋变暖速度加快"
CJK_TYPO = "科学家发现海洋变热速度加快"          # one char edited
CJK_OTHER = "城市交通状况有了明显改善提升"       # wholly different

DOC_BASE = f"{LATIN} {CJK_PARA} end"
DOC_TYPO = f"{LATIN} {CJK_TYPO} end"
DOC_REPL = f"{LATIN} {CJK_OTHER} end"


def _docs(spark):
    rows = [(1, DOC_BASE), (2, DOC_TYPO), (3, DOC_REPL)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_embedded_paragraph_is_below_the_dominance_line(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        chargram_dominant,
        unsegmented_dominant,
    )

    df = _docs(spark)
    rows = df.select(
        unsegmented_dominant("text").alias("u"),
        chargram_dominant("text").alias("c"),
    ).collect()
    assert all(not r["u"] and not r["c"] for r in rows)


def test_word_path_cannot_rank_typo_above_replacement(spark):
    """The blind spot: with the CJK paragraph as ONE token, a typo pair
    and a replaced-paragraph pair lose exactly the same shingles, so
    word-shingle jaccard CANNOT distinguish them."""
    j = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in jaccard_pairs(
            _docs(spark), threshold=0.1, tokenizer="word"
        ).collect()
    }
    assert j[(1, 2)] == j[(1, 3)]


def test_runs_lane_ranks_typo_above_replacement(spark):
    """With per-run char-gramming the typo pair shares most of the
    paragraph's gram tokens while the replacement pair shares none —
    the embedded-CJK near-dup pair becomes visible AS a near-dup."""
    j = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in jaccard_pairs(
            _docs(spark), threshold=0.1, tokenizer="runs"
        ).collect()
    }
    assert j[(1, 2)] > j[(1, 3)]


def test_pure_latin_shingles_match_the_word_path(spark):
    docs = spark.createDataFrame(
        [(1, LATIN)], "doc_id long, text string"
    )
    w = {r["shingle"] for r in shingle_set(docs, tokenizer="word").collect()}
    r = {r["shingle"] for r in shingle_set(docs, tokenizer="runs").collect()}
    assert w == r


def test_pure_cjk_tokens_match_char_ngrams(spark):
    docs = spark.createDataFrame(
        [(1, CJK_PARA)], "doc_id long, text string"
    )
    [a] = docs.select(script_run_tokens("text", 2).alias("t")).collect()
    [b] = docs.select(char_ngrams("text", 2).alias("t")).collect()
    assert a["t"] == b["t"]


def test_runs_rejected_where_not_implemented(spark):
    import pytest

    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        simhash,
    )

    with pytest.raises(ValueError, match="tokenizer must be"):
        simhash(_docs(spark), tokenizer="runs")
