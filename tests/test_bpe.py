"""BPE vocabulary training + encoding: hand-computed merge order,
losslessness, monotone compression, and Spark-vs-pure-Python parity."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.bpe import (
    _PRE_TOKEN_RE,
    encode_bpe,
    encode_word,
    train_bpe,
    word_counts,
)


def test_train_bpe_hand_computed(spark):
    # corpus: "aaab" x3, "aab" x1 -> pair counts (a,a)=7, (a,b)=4
    # merge1 = (a,a) -> words become [aa,a,b]x3, [aa,b]
    # then (aa,a)=3, (a,b)=3, (aa,b)=1 -> tie 3 vs 3, lexicographic:
    # ("a","b") < ("aa","a")  -> merge2 = (a,b)
    df = spark.createDataFrame(
        [("aaab aaab aaab aab",)], "text string"
    )
    merges = train_bpe(word_counts(df), n_merges=2)
    assert merges == [("a", "a"), ("a", "b")]


def test_encode_word_respects_rank_order():
    # ranks: (a,a) first, then (a,b): "aaab" -> [aa, ab]
    ranks = {("a", "a"): 0, ("a", "b"): 1}
    assert encode_word("aaab", ranks) == ["aa", "ab"]
    # without the (a,b) merge the b stays alone
    assert encode_word("aaab", {("a", "a"): 0}) == ["aa", "a", "b"]
    # overlapping run merges left-to-right: "aaa" -> [aa, a]
    assert encode_word("aaa", {("a", "a"): 0}) == ["aa", "a"]


def test_encode_lossless_and_monotone(spark):
    texts = [
        "the cat sat on the mat",
        "the catalog of cats concatenated",
        "numbers 12345 and punct!? mix-ups",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wc = word_counts(df)
    prev_total = None
    for n_merges in (0, 4, 16):
        merges = train_bpe(wc, n_merges=n_merges)
        out = encode_bpe(df, merges).orderBy("doc_id").collect()
        for row, text in zip(out, texts):
            # lossless: concatenated tokens reproduce the pre-token stream
            assert "".join(row["tokens"]) == "".join(_PRE_TOKEN_RE.findall(text))
            assert row["n_tokens"] == len(row["tokens"])
        total = sum(r["n_tokens"] for r in out)
        if prev_total is not None:
            assert total <= prev_total  # more merges never inflate
        prev_total = total


def test_spark_encode_matches_pure_python(spark):
    texts = [
        "deterministic reproducible tokenization",
        "shared subwords: determine determined determinism",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(word_counts(df), n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r["tokens"] for r in encode_bpe(df, merges).collect()}
    for i, t in enumerate(texts):
        expect = [
            tok for w in _PRE_TOKEN_RE.findall(t) for tok in encode_word(w, ranks)
        ]
        assert got[i] == expect


def test_word_counts_is_distributed_shape(spark):
    """The corpus pass must be explode -> partial-agg shuffle, no UDFs."""
    df = spark.createDataFrame([("a b c a",)], "text string")
    plan = word_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regexes_agree_jvm_python(spark):
    """One boundary definition: JVM regexp_extract_all == Python findall."""
    texts = ["mix 12ab !?", "under_score", "", "tabs\tand\nnewlines x9"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from polygon_io_data_ingestion_pipeline_spark.operators.text import BPE_TOKEN_RE

    got = df.select(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), F.lit(0)).alias("t")
    ).collect()
    for row, t in zip(got, texts):
        assert row["t"] == _PRE_TOKEN_RE.findall(t)


def test_bpe_packed_batches_contract(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.bpe import (
        bpe_packed_batches,
        train_bpe,
        word_counts,
    )

    rows = [
        (i, "web" if i % 2 == 0 else "books", f"token stream number {i} repeats repeats")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    merges = train_bpe(word_counts(df), n_merges=12)
    packed = bpe_packed_batches(df, merges, capacity=16, shard_span=8).collect()
    assert len(packed) == 30
    by_group: dict[str, list] = {}
    for r in packed:
        assert r["n_tokens"] == len(r["tokens"])  # REAL bpe counts drive packing
        assert r["bin_id"] == r["tok_offset"] // 16
        by_group.setdefault(r["source"], []).append(r)
    for rows_g in by_group.values():
        rows_g.sort(key=lambda r: r["doc_id"])
        # offsets are the exact prefix sum of the BPE token counts
        run = 0
        for r in rows_g:
            assert r["tok_offset"] == run
            run += r["n_tokens"]


def test_bpe_packed_batches_scoped_frees_the_persisted_encoding(spark):
    """The scoped variant is the explicit resource handle: inside the
    block the encoded intermediate is persisted (tokenize-once across
    the packer's plan branches); on exit it is unpersisted, so
    long-lived sessions composing many packs do not accumulate
    executor-storage residue."""
    from polygon_io_data_ingestion_pipeline_spark.operators.bpe import (
        bpe_packed_batches_scoped,
        train_bpe,
        word_counts,
    )

    rows = [
        (i, "web" if i % 2 == 0 else "books", f"token stream number {i} repeats")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    merges = train_bpe(word_counts(df), n_merges=8)

    # Track the SPECIFIC rdd ids the scope introduces, not global counts:
    # Spark's ContextCleaner unpersists other tests' garbage-collected
    # frames asynchronously, so absolute sizes drift mid-test (flaked
    # once under a full-suite run).
    def _pids() -> set[int]:
        return {
            int(k)
            for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        }

    base = _pids()
    with bpe_packed_batches_scoped(df, merges, capacity=16, shard_span=8) as packed:
        got = packed.collect()
        assert len(got) == 20
        new = _pids() - base
        assert new  # encoding persisted
    assert not (new & _pids())  # the scope's persist freed on exit

    # exceptions inside the block release the persist too
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        with bpe_packed_batches_scoped(df, merges, capacity=16, shard_span=8) as packed:
            packed.take(1)  # materialize so the persist actually registers
            leaked = _pids() - base
            raise RuntimeError("boom")
    assert not (leaked & _pids())
