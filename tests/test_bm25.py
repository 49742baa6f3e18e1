"""BM25 retrieval semantics: relevance ordering, tf saturation, and
rare-term weighting on a hand-built corpus."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.text import bm25_topk


def _corpus(spark):
    rows = [
        (1, "spark spark spark spark spark filler filler filler"),
        (2, "spark stream filler filler filler filler filler filler"),
        (3, "stream filler filler filler filler filler filler filler"),
        (4, "filler filler filler filler filler filler filler filler"),
        (5, "rareword filler filler filler filler filler filler filler"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_multi_term_match_beats_stuffing(spark):
    # Doc 2 hits both query terms; doc 1 stuffs one term. BM25's tf
    # saturation (k1) keeps coverage ahead of repetition.
    got = bm25_topk(_corpus(spark), ["spark", "stream"], k=5).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 2
    assert set(ids) == {1, 2, 3}  # doc 4/5 share no term -> absent
    hits = {r["doc_id"]: r["n_terms_hit"] for r in got}
    assert hits == {2: 2, 1: 1, 3: 1}


def test_rare_term_outweighs_common(spark):
    rows = [
        (1, "common rare x x x x"),
        (2, "common x x x x x"),
        (3, "common x x x x x"),
        (4, "common x x x x x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, ["common", "rare"], k=4).collect()
    assert got[0]["doc_id"] == 1
    # idf(common, df=4/4) is near zero; the rare term dominates doc 1's score.
    assert got[0]["score"] > 2 * got[1]["score"]


def test_scores_deterministic_across_repartition(spark):
    df = _corpus(spark)
    a = bm25_topk(df, ["spark", "stream"], k=5).collect()
    b = bm25_topk(df.repartition(7), ["spark", "stream"], k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
