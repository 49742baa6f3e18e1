"""Exact cross-document SPAN dedup (the suffix-array substring-dedup
recipe distributed at K-token-gram granularity): duplicated runs >= K
tokens are removed in FULL (overlapping grams merge into maximal
spans), doc-unique text survives, short docs and within-document
repeats are untouched, and the null/empty contract matches line dedup."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    duplicated_span_removal,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SPAN = "one two three four five six seven eight nine ten"  # 10 tokens


def test_shared_span_removed_in_full_unique_kept(spark):
    """A 10-token span shared by two docs is longer than K=8: its three
    overlapping flagged 8-grams must merge so ALL ten tokens go, while
    each doc's unique prefix/suffix survives in order."""
    rows = [
        (1, f"alpha start {SPAN} alpha end"),
        (2, f"bravo opens {SPAN} bravo closes"),
        (3, "charlie has entirely unique content"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_span_removal(
            _docs(spark, rows), span_tokens=8
        ).collect()
    }
    assert got[1] == "alpha start alpha end"
    assert got[2] == "bravo opens bravo closes"
    assert got[3] == "charlie has entirely unique content"


def test_within_document_repeat_is_not_cross_document(spark):
    """min_docs counts DISTINCT documents: a doc repeating its own
    span twice keeps both copies when no other doc shares it."""
    rows = [
        (1, f"{SPAN} middle words {SPAN}"),
        (2, "totally different text over here with many tokens present"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_span_removal(
            _docs(spark, rows), span_tokens=8
        ).collect()
    }
    assert got[1] == f"{SPAN} middle words {SPAN}"


def test_short_docs_carry_no_grams(spark):
    """Docs shorter than K tokens never flag — even two IDENTICAL short
    docs survive (span dedup is not exact-dedup; that's a different
    operator)."""
    rows = [(1, "same seven tokens in both docs here"),
            (2, "same seven tokens in both docs here")]
    got = duplicated_span_removal(_docs(spark, rows), span_tokens=8).collect()
    assert {r["text"] for r in got} == {"same seven tokens in both docs here"}


def test_null_empty_and_all_removed_contract(spark):
    """NULL text stays NULL; empty stays empty; a doc that IS the
    shared span rewrites to empty text but keeps its row."""
    rows = [
        (1, SPAN),
        (2, f"{SPAN}"),
        (3, None),
        (4, ""),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_span_removal(
            _docs(spark, rows), span_tokens=8
        ).collect()
    }
    assert got[1] == ""
    assert got[2] == ""
    assert got[3] is None
    assert got[4] == ""


def test_whitespace_normalized_tokenization(spark):
    """Tokenization is whitespace-split: tab/multi-space variants of the
    same span match, and rebuilt text joins tokens with single spaces."""
    messy = SPAN.replace(" six ", "   six\t")
    rows = [
        (1, f"keep this {messy} tail kept"),
        (2, f"other head {SPAN} other tail"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_span_removal(
            _docs(spark, rows), span_tokens=8
        ).collect()
    }
    assert got[1] == "keep this tail kept"
    assert got[2] == "other head other tail"


def test_plan_has_no_python_workers(spark):
    """The whole pipeline is native expressions — no
    BatchEvalPython/ArrowEvalPython stages."""
    df = _docs(spark, [(1, f"a b {SPAN}"), (2, f"c d {SPAN}")])
    plan = (
        duplicated_span_removal(df, span_tokens=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
