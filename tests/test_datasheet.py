"""Corpus datasheet: metric completeness, hand-checked values, and
consistency with the operators it composes."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.datasheet import corpus_datasheet

GOOD = (
    "the data in a table is the value of the row and the key for the "
    "batch while the line in a window is the part of the sort and the "
    "scan of the day holds the merge"
)


def test_datasheet_values_hand_checked(spark):
    rows = [
        (1, GOOD),  # passes the gate
        (2, GOOD),  # exact duplicate of 1
        (3, "junk"),  # too short -> fails length
        (4, GOOD.upper()),  # case-folded dup of 1 (fingerprint collapses)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["metric"]: r["value"] for r in corpus_datasheet(df).collect()}

    assert got["n_docs"] == 4.0
    assert got["short_doc_share"] == 0.25
    # 4 docs, 2 distinct fingerprints -> dup rate 0.5
    assert got["exact_dup_rate"] == 0.5
    assert got["fail_rate:ok_length"] == 0.25
    # the UPPERCASE dup also fails the (case-sensitive) stopword rule
    assert got["fail_rate:ok_stopwords"] == 0.5
    assert got["quality_pass_rate"] == 0.5
    # language shares sum to 1 over the lang_share metrics
    shares = [v for k, v in got.items() if k.startswith("lang_share:")]
    assert abs(sum(shares) - 1.0) < 1e-9
    assert got["n_tokens_total"] == sum(len(t.split()) for _, t in rows)


def test_datasheet_consistent_with_composed_operators(spark, sf_dir):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import exact_duplicates
    from polygon_io_data_ingestion_pipeline_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    got = {r["metric"]: r["value"] for r in corpus_datasheet(docs).collect()}
    n = docs.count()
    assert got["n_docs"] == float(n)
    distinct_fp = exact_duplicates(docs).count()
    assert got["exact_dup_rate"] == round(1 - distinct_fp / n, 6)


def test_datasheet_language_shares_use_real_langid(spark):
    """A German and a Russian document must land under their own
    lang_share metrics (regression: the old marker table labeled every
    non-English Latin page by fixture-shaped keywords)."""
    rows = [
        (1, GOOD),
        (2, "das wetter war kalt und die kinder blieben mit ihren eltern "
            "zu hause weil der regen den ganzen tag nicht aufhören wollte "
            "und die straßen unter wasser standen"),
        (3, "Привет мир как дела сегодня утром после дождя на улице"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["metric"]: r["value"] for r in corpus_datasheet(df).collect()}
    assert got["lang_share:en"] == round(1 / 3, 6)
    assert got["lang_share:de"] == round(1 / 3, 6)
    assert got["lang_share:ru"] == round(1 / 3, 6)
