"""Hand-case tests for the unigram-LM score and the retention matrix
(the sf0.01 oracle parity replica covers full-corpus behavior)."""

from __future__ import annotations

import datetime as dt
import math

from polygon_io_data_ingestion_pipeline_spark.operators.retention import retention_matrix
from polygon_io_data_ingestion_pipeline_spark.operators.text import unigram_logprob


def test_unigram_logprob_orders_docs_by_typicality(spark):
    rows = [
        (1, "the the the the"),  # most typical tokens
        (2, "the the rare1 rare2"),  # half rare
        (3, "zzz1 zzz2 zzz3 zzz4"),  # all singletons
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    # Corpus: 'the' x6, six singletons; total 12 tokens.
    p_the = 6 / 12
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["avg_logprob"] - round(round(math.log(p_the) * 1e6) / 1e6, 6)) < 1e-6
    # Typicality ordering and the perplexity-units proxy.
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"] > out[3]["avg_logprob"]
    # exp(-ln(1/12)) = 12 up to the 1e-6 logprob quantization.
    assert abs(out[3]["ppl_proxy"] - 12.0) < 1e-4
    assert out[1]["ppl_proxy"] < out[2]["ppl_proxy"] < out[3]["ppl_proxy"]


def test_retention_matrix_hand_case(spark):
    mon1 = dt.datetime(2024, 1, 1, 12, 0)  # Monday, week 1
    mon2 = mon1 + dt.timedelta(days=7)
    mon3 = mon1 + dt.timedelta(days=14)
    rows = [
        (1, mon1), (1, mon2), (1, mon3),  # user 1: weeks 0,1,2
        (2, mon1), (2, mon3),             # user 2: weeks 0,2
        (3, mon2),                        # user 3: cohort = week 2, only itself
        (1, mon1 + dt.timedelta(hours=3)),  # same-week dup: no double count
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort"], r["week_offset"]): r for r in retention_matrix(df).collect()}
    c1 = "2024-01-01"
    assert out[(c1, 0)]["n_active"] == 2 and out[(c1, 0)]["cohort_size"] == 2
    assert out[(c1, 0)]["retention"] == 1.0  # offset 0 is the cohort itself
    assert out[(c1, 1)]["n_active"] == 1 and out[(c1, 1)]["retention"] == 0.5
    assert out[(c1, 2)]["n_active"] == 2 and out[(c1, 2)]["retention"] == 1.0
    c2 = "2024-01-08"
    assert out[(c2, 0)]["n_active"] == 1 and out[(c2, 0)]["cohort_size"] == 1
    assert set(out) == {(c1, 0), (c1, 1), (c1, 2), (c2, 0)}


def test_bigram_flags_word_salad_unigram_misses(spark):
    """The order-2 proxy's reason to exist: a shuffled document has the
    SAME unigram distribution as its source but scrambled transitions."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        bigram_logprob,
        unigram_logprob,
    )

    base = "the cat sat on the mat and the dog lay by the door"
    words = base.split(" ")
    # deterministic scramble destroying transitions but keeping counts
    salad = " ".join(words[::2] + words[1::2][::-1])
    rows = []
    for rep in range(6):  # corpus of fluent docs establishes transitions
        rows.append((rep, base))
    rows.append((100, salad))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uni = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob(df).collect()}
    assert abs(uni[100] - uni[0]) < 1e-9  # unigram CANNOT tell them apart

    bi = {r["doc_id"]: r["avg_logprob2"] for r in bigram_logprob(df).collect()}
    assert bi[100] < bi[0]  # transitions expose the salad


def test_bigram_skips_sub_two_token_docs(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert set(got) == {2}
    assert got[2]["n_bigrams"] == 1
