"""Cross-document line dedup (CCNet/Dolma paragraph-hash recipe at line
granularity): boilerplate lines shared by >= min_docs documents are
removed, unique content and line order survive, short lines are
protected by min_chars, and fully-boilerplate documents keep their row
with empty text."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    duplicated_line_removal,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_shared_lines_removed_unique_kept_in_order(spark):
    boiler = "All rights reserved Example Corp"
    rows = [
        (1, f"alpha first\n{boiler}\nalpha second", "a"),
        (2, f"{boiler}\nbravo only line", "b"),
        (3, "charlie standalone", "c"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_line_removal(_docs(spark, rows)).collect()
    }
    assert got[1] == "alpha first\nalpha second"
    assert got[2] == "bravo only line"
    assert got[3] == "charlie standalone"


def test_whitespace_normalized_match_and_threshold(spark):
    rows = [
        (1, "  Shared   line  \nunique one", "a"),
        (2, "Shared line\nunique two", "b"),
        (3, "thrice\nunique three", "c"),
        (4, "thrice\nunique four", "d"),
        (5, "thrice\nunique five", "e"),
    ]
    # min_docs=3: the 2-doc line survives, the 3-doc line goes
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_line_removal(_docs(spark, rows), min_docs=3).collect()
    }
    assert "Shared" in got[1] and "Shared" in got[2]
    assert got[3] == "unique three" and got[5] == "unique five"
    # min_docs=2: whitespace variants of the shared line match and go
    got2 = {
        r["doc_id"]: r["text"]
        for r in duplicated_line_removal(_docs(spark, rows), min_docs=2).collect()
    }
    assert got2[1] == "unique one" and got2[2] == "unique two"


def test_min_chars_protects_short_lines_and_empty_doc_survives(spark):
    rows = [
        (1, "Intro\nlong shared boilerplate line here", "a"),
        (2, "Intro\nlong shared boilerplate line here", "b"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_line_removal(
            _docs(spark, rows), min_docs=2, min_chars=10
        ).collect()
    }
    # the short heading is protected; the long boilerplate is not
    assert got[1] == "Intro" and got[2] == "Intro"
    # with no protection everything shared goes, but the rows remain
    got2 = {
        r["doc_id"]: r["text"]
        for r in duplicated_line_removal(_docs(spark, rows), min_docs=2).collect()
    }
    assert got2 == {1: "", 2: ""}


def test_untouched_document_roundtrips_exactly(spark):
    text = "one\n\ntwo  spaced\nthree"  # empty line + inner spacing survive
    got = duplicated_line_removal(
        _docs(spark, [(1, text, "a")])
    ).collect()[0]["text"]
    assert got == text


def test_plan_stays_native(spark):
    df = _docs(spark, [(1, "a\nb", "s")])
    plan = (
        duplicated_line_removal(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_null_text_stays_null(spark):
    """A NULL-text doc explodes to no line rows and is absent from the
    rebuild; the empty-string substitution must NOT claim it (null vs
    empty is a real downstream distinction: quarantine vs gated)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        duplicated_line_removal,
    )

    docs = spark.createDataFrame(
        [(1, "shared\nunique a"), (2, "shared\nunique b"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in duplicated_line_removal(docs).collect()}
    assert got[1] == "unique a" and got[2] == "unique b"
    assert got[3] is None
