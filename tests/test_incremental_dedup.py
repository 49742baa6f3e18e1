"""Incremental (shard-vs-history) dedup: cold start, cross-shard
suppression, within-shard dedup, delta exactness, and the multi-shard
invariant that replaying shards yields the same corpus as one batch."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    exact_duplicates,
    incremental_dedup,
)

SCHEMA = "doc_id long, text string"


def test_cold_start_dedups_within_shard(spark):
    shard = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "AAA")], SCHEMA
    )
    novel, delta = incremental_dedup(shard, None)
    got = sorted(r["doc_id"] for r in novel.collect())
    # case-folded fingerprint: 1, 3 and 4 collapse; min doc_id survives
    assert got == [1, 2]
    assert delta.count() == 2


def test_history_suppresses_and_delta_appends(spark):
    s1 = spark.createDataFrame([(1, "day one text"), (2, "shared text")], SCHEMA)
    novel1, delta1 = incremental_dedup(s1, None)
    assert sorted(r["doc_id"] for r in novel1.collect()) == [1, 2]

    history = delta1  # appended to the lake after shard 1
    s2 = spark.createDataFrame(
        [(10, "shared text"), (11, "genuinely new"), (12, "genuinely new")], SCHEMA
    )
    novel2, delta2 = incremental_dedup(s2, history)
    assert sorted(r["doc_id"] for r in novel2.collect()) == [11]
    # delta holds ONLY the new fingerprint, exactly once
    assert delta2.count() == 1
    assert not delta2.join(history, "fp", "left_semi").count()


def test_sharded_replay_equals_one_batch(spark):
    rows = [(i, f"text {i % 7}") for i in range(40)]
    batch = spark.createDataFrame(rows, SCHEMA)
    batch_novel, _ = incremental_dedup(batch, None)
    expect = sorted(r["doc_id"] for r in batch_novel.collect())
    # same corpus as canonical ids from exact_duplicates
    classes = exact_duplicates(batch)
    assert expect == sorted(r["canonical_id"] for r in classes.collect())

    history = None
    got = []
    for lo in range(0, 40, 10):
        shard = spark.createDataFrame(rows[lo : lo + 10], SCHEMA)
        novel, delta = incremental_dedup(shard, history)
        got.extend(r["doc_id"] for r in novel.collect())
        history = delta if history is None else history.union(delta)
    assert sorted(got) == expect


def test_exact_duplicates_normalized_key(spark):
    """normalized=True collapses cosmetic variants (curly quotes,
    punctuation, NBSP, differing timestamps/ids) the strict fingerprint
    keeps apart; genuinely different text stays distinct."""
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        exact_duplicates,
    )

    rows = [
        (1, "The cat sat -- 2024-01-01 (id 42)"),
        (2, "the  cat sat — 2025-12-31 [id 7]"),  # cosmetic variant
        (3, "the dog sat -- 2024-01-01 (id 42)"),          # real difference
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    strict = exact_duplicates(df)
    assert strict.count() == 3  # fingerprint keeps all apart
    classes = {
        r["canonical_id"]: r["dup_count"]
        for r in exact_duplicates(df, normalized=True).collect()
    }
    assert classes == {1: 2, 3: 1}  # 1 and 2 collapse, 3 stays


def test_dedup_normalized_expression_rules(spark):
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        dedup_normalized,
    )

    df = spark.createDataFrame(
        [("“Hello,”  World’s #1 — best 2024!",)], "text string"
    )
    got = df.select(dedup_normalized("text").alias("n")).collect()[0]["n"]
    assert got == "hello world s 0 best 0"
    # digits preserved when fold_digits=False
    got2 = df.select(
        dedup_normalized("text", fold_digits=False).alias("n")
    ).collect()[0]["n"]
    assert got2 == "hello world s 1 best 2024"


def test_normalized_dedup_empty_form_falls_back_to_strict(spark):
    """Letter/digit-free docs (emoji, ASCII art, punctuation) normalize
    to '' — they must NOT all collapse into one corpus-wide class;
    identical ones still dedup via the strict fingerprint."""
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        exact_duplicates,
    )

    rows = [(1, "-----"), (2, "!!!"), (3, "-----"), (4, "real words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    classes = {
        r["canonical_id"]: r["dup_count"]
        for r in exact_duplicates(df, normalized=True).collect()
    }
    assert classes == {1: 2, 2: 1, 4: 1}  # 1+3 identical; 2 distinct
