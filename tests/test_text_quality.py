"""Unit tests for the text-quality operator family: shingle edge cases,
repetition metrics, and benchmark decontamination — crafted fixtures
with hand-computed expectations (the sf0.01 oracle parity replica in
test_oracle_parity.py covers the full-corpus behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import contamination_overlap
from polygon_io_data_ingestion_pipeline_spark.operators.text import (
    repetition_stats,
    word_shingles,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_short_text_guard(spark):
    # Spark's sequence(1, 0) DESCENDS — an unguarded transform would emit
    # bogus partial shingles for docs shorter than n tokens.
    df = _docs(
        spark,
        [(1, "one"), (2, "one two"), (3, "one two three"), (4, "one two three four")],
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert got[1] == []
    assert got[2] == []
    assert got[3] == ["one two three"]
    assert got[4] == ["one two three", "two three four"]


def test_repetition_stats_hand_computed(spark):
    # doc 1: 4 tokens, all distinct -> dup ratio 0; bigrams all unique -> 1/3
    # doc 2: "a a a a" -> dup ratio 3/4; single bigram "a a" x3 -> 1.0
    # doc 3: one token -> no bigrams -> NULL top_bigram_frac
    df = _docs(spark, [(1, "w x y z"), (2, "a a a a"), (3, "solo")])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["dup_word_ratio"] == 0.0
    assert abs(got[1]["top_bigram_frac"] - round(1 / 3, 6)) < 1e-9
    assert got[2]["dup_word_ratio"] == 0.75
    assert got[2]["top_bigram_frac"] == 1.0
    assert got[3]["n_tokens"] == 1
    assert got[3]["top_bigram_frac"] is None


def test_contamination_overlap_counts_and_flag(spark):
    # Benchmark doc: "q1 q2 q3 q4" -> shingles {q1 q2 q3, q2 q3 q4}.
    # corpus doc 10 repeats the full benchmark text (4/4 shingles hit),
    # doc 11 shares one shingle run, doc 12 shares nothing.
    bench = _docs(spark, [(100, "q1 q2 q3 q4")])
    corpus = _docs(
        spark,
        [
            (10, "q1 q2 q3 q4 tail1 tail2"),
            (11, "x q1 q2 q3 y z"),
            (12, "u v w p q r"),
        ],
    )
    got = {r["doc_id"]: r for r in contamination_overlap(corpus, bench, threshold=0.5).collect()}
    assert (got[10]["n_overlap"], got[10]["n_shingles"]) == (2, 4)
    assert got[10]["is_contaminated"] == 1  # 0.5 >= 0.5
    assert (got[11]["n_overlap"], got[11]["n_shingles"]) == (1, 4)
    assert got[11]["is_contaminated"] == 0
    assert (got[12]["n_overlap"], got[12]["is_contaminated"]) == (0, 0)


def test_contamination_join_is_broadcast(spark):
    bench = _docs(spark, [(100, "q1 q2 q3 q4")])
    corpus = _docs(spark, [(10, "q1 q2 q3 q4 t1 t2")])
    plan = contamination_overlap(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_sequence_packing_two_level_matches_single_window(spark):
    """The sharded two-level prefix sum must be bit-identical to the
    naive single-window formulation, including across shard boundaries
    and with sparse/non-contiguous doc ids."""
    import random

    from pyspark.sql import Window as W

    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        sequence_packing,
        token_count,
    )

    rng = random.Random(7)
    rows = []
    next_id = 0
    for _ in range(240):
        next_id += rng.randint(1, 9)  # sparse, non-contiguous ids
        words = " ".join("w%d" % k for k in range(rng.randint(1, 12)))
        rows.append((next_id, words, "src%d" % (next_id % 3)))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # shard_span=16 forces many shards per group; capacity=20 forces
    # bins that straddle shard boundaries.
    got = sequence_packing(df, capacity=20, shard_span=16).collect()

    w = W.partitionBy("source").orderBy("doc_id")
    base = df.select("doc_id", "source", token_count("text").alias("n_tokens"))
    off = F.sum("n_tokens").over(w) - F.col("n_tokens")
    naive = base.select(
        "doc_id",
        "source",
        "n_tokens",
        off.alias("tok_offset"),
        F.floor(off / 20).alias("bin_id"),
    )
    wb = W.partitionBy("source", "bin_id").orderBy("doc_id")
    want = naive.withColumn("pos_in_bin", F.row_number().over(wb).cast("long")).collect()

    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(map(tuple, got), key=lambda t: (t[1], t[0])) == sorted(
        map(tuple, want), key=lambda t: (t[1], t[0])
    )


def test_sequence_packing_no_single_task_owns_a_group(spark):
    """Scale guard: the corpus-sized cumulative window must be
    partitioned by (group, shard), never by the low-cardinality group
    alone — otherwise one reducer owns a whole source's stream."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import sequence_packing

    df = spark.createDataFrame(
        [(i, "a b c", "only_source") for i in range(100)],
        "doc_id long, text string, source string",
    )
    plan = sequence_packing(df, shard_span=16)._jdf.queryExecution().executedPlan().toString()
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs, plan
    for ln in specs:
        spec = ln[ln.index("windowspecdefinition") :]
        head = spec[: spec.index("ASC")] if "ASC" in spec else spec
        if "n_tokens" in ln and "__shard_tokens" not in ln:
            # the corpus-sized token cumsum: must carry the shard key
            assert "__pack_shard" in head, ln
        # every remaining group-only window must be the one over the
        # per-shard aggregate (its input column is __shard_tokens) or
        # the per-bin row_number (keyed by bin_id).
        if "__pack_shard" not in head:
            assert "__shard_tokens" in ln or "bin_id" in head, ln


def test_quality_filter_flags_hand_computed(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.text import quality_filter

    good = "the quick brown fox jumps over a lazy dog near the quiet river bank " * 2
    df = _docs(
        spark,
        [
            (1, good.strip()),                      # passes everything
            (2, "the " + "spam spam " * 15),        # repetition: dup + bigram
            (3, "zz yy xx ww vv uu tt ss rr qq " * 3),  # no stopwords
            (4, "the of a to and"),                 # too short (< 20 tokens)
        ],
    )
    rows = {r["doc_id"]: r for r in quality_filter(df).collect()}
    assert rows[1]["keep"] is True and all(
        rows[1][f] for f in ("ok_length", "ok_word_len", "ok_stopwords", "ok_repetition")
    )
    assert rows[2]["keep"] is False and rows[2]["ok_repetition"] is False
    assert rows[3]["keep"] is False and rows[3]["ok_stopwords"] is False
    assert rows[4]["keep"] is False and rows[4]["ok_length"] is False
    # every drop is attributable: keep == conjunction of the flags
    for r in rows.values():
        assert r["keep"] == (
            r["ok_length"] and r["ok_word_len"] and r["ok_stopwords"] and r["ok_repetition"]
        )


def test_duplicated_ngram_fraction_hand_case(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        duplicated_ngram_fraction,
    )

    rows = [
        (0, "the quick brown fox jumps"),  # shares "the quick brown"+"quick brown fox" with doc 1
        (1, "the quick brown fox sleeps"),
        (2, "entirely different words here now"),
        (3, "too short"),  # < 3 tokens -> no shingles, dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicated_ngram_fraction(df).collect()}
    assert set(out) == {0, 1, 2}
    # Docs 0/1: 3 distinct trigrams each, 2 shared ("the quick brown",
    # "quick brown fox").
    for d in (0, 1):
        assert out[d]["n_shingles"] == 3
        assert out[d]["n_dup"] == 2
        assert abs(out[d]["dup_ratio"] - round(2 / 3, 6)) < 1e-9
    assert out[2]["n_dup"] == 0 and out[2]["dup_ratio"] == 0.0


def test_chunk_windows_hand_case(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.text import chunk_windows

    doc = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = _docs(spark, [(1, doc), (2, "a b"), (3, "")])
    out = chunk_windows(df, max_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # Doc 1: starts 0,3,6,9 -> lengths 4,4,4,1, overlapping by one token.
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [c["n_chunk_tokens"] for c in chunks] == [4, 4, 4, 1]
    assert chunks[0]["chunk_text"] == "w0 w1 w2 w3"
    assert chunks[1]["chunk_text"] == "w3 w4 w5 w6"
    assert chunks[3]["chunk_text"] == "w9"
    # Every token appears in some chunk; consecutive chunks overlap.
    assert set(doc.split()) == {t for c in chunks for t in c["chunk_text"].split()}
    # Doc 2 fits in one window; empty doc 3 emits nothing (split('')
    # yields [''], one bogus token — the operator treats it as 1 token).
    assert [c["chunk_text"] for c in by_doc[2]] == ["a b"]


def test_quality_score_orders_and_bounds(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.text import quality_score

    rich = "the data in a table is the value of the row and the key " * 4
    poor = "!!! ??? ### $$$ %%%"
    df = _docs(spark, [(1, rich.strip()), (2, poor)])
    out = {r["doc_id"]: r for r in quality_score(df).collect()}
    for r in out.values():
        assert 0.0 < r["quality_score"] < 1.0
        assert r["keep"] == (1 if r["quality_score"] >= 0.5 else 0)
    # Long, stopword-rich prose outscores short punctuation soup.
    assert out[1]["quality_score"] > out[2]["quality_score"]
    assert out[1]["keep"] == 1 and out[2]["keep"] == 0


def test_shared_substring_pairs_detects_copied_run(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        shared_substring_pairs,
    )

    copied = "this exact passage was copied verbatim between documents"
    rows = [
        (1, "intro words " + copied),
        (2, copied + " plus an unrelated tail"),
        (3, "zq xv jk wp mn bc df gh"),  # shares no 10-char run
    ]
    df = _docs(spark, rows)
    pairs = {(r["id1"], r["id2"]): r["n_shared"] for r in shared_substring_pairs(df).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= 2  # a long copied run shares many fingerprints
    assert all(3 not in p for p in pairs)
    # min_shared raises the evidence bar.
    high = shared_substring_pairs(df, min_shared=10**6).collect()
    assert high == []


def test_predicted_lang_script(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        predicted_lang_script,
    )

    cases = [
        ("the data in the table of the batch", "en"),   # latin -> keyword fallback
        ("Привет мир как дела сегодня утром", "ru"),
        ("こんにちは世界です元気ですか", "ja"),          # kana + han -> ja
        ("你好世界中文文本没有假名", "zh"),              # pure han, no kana -> zh
        ("안녕하세요 세계 여러분 반갑습니다", "ko"),
        ("مرحبا بالعالم كيف حالك اليوم", "ar"),
        ("नमस्ते दुनिया आप कैसे हैं", "hi"),
        ("Γειά σου Κόσμε τι κάνεις σήμερα", "el"),
        ("שלום עולם מה שלומך היום", "he"),
        ("สวัสดีชาวโลกสบายดีไหมวันนี้", "th"),
        # mixed page: a Latin URL does not drown the Cyrillic body
        ("смотрите наш сайт www.example.com сегодня же", "ru"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [r["l"] for r in df.select(predicted_lang_script("text").alias("l")).collect()]
    assert got == [want for _, want in cases]


def test_quality_filter_unsegmented_lane(spark):
    """Round 11: Han/kana/Thai prose fails every word-level rule
    STRUCTURALLY (no spaces: one giant token, zero space-split
    stopwords) — with unsegmented_markers the gate judges such docs by
    character-level analogues; Latin docs keep the word rules bit-for
    bit; marker-less CJK salad and repeated-bigram spam still fail."""
    from polygon_io_data_ingestion_pipeline_spark.functions.script_families import (
        UNSEGMENTED_FUNCTION_MARKERS,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        multilingual_stopwords,
        quality_filter,
    )

    zh = ("科学家发现海洋变暖的速度比他们想象的要快这对所有国家来说都是"
          "一个问题因为气候变化的影响正在不断加剧而且没有任何放缓的迹象")
    ja = ("科学者たちは海洋が彼らの考えよりも速く温暖化していることを発見"
          "しましたこれはすべての国にとって大きな問題になると考えられます")
    th = ("นักวิทยาศาสตร์พบว่ามหาสมุทรกำลังอุ่นขึ้นเร็วกว่าที่พวกเขาคิดและนี่จะเป็น"
          "ปัญหาสำหรับทุกประเทศในอีกไม่กี่ปีข้างหน้าเพราะผลกระทบของการเปลี่ยนแปลง")
    salad = "科鯨山火水木金土日月車馬魚鳥石田力刀弓玉貝" * 3  # no markers
    spam = "的了" * 60  # one character-bigram dominates
    en = ("the data in a table is the value of the row and the key for "
          "the batch while the line in a window is the part of the sort")
    rows = [(1, zh), (2, ja), (3, th), (4, salad), (5, spam), (6, en)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in quality_filter(
            df,
            stopwords=multilingual_stopwords(),
            unsegmented_markers=UNSEGMENTED_FUNCTION_MARKERS,
        ).collect()
    }
    assert got[1]["keep"] and got[2]["keep"] and got[3]["keep"]
    assert not got[4]["keep"] and not got[4]["ok_stopwords"]
    assert not got[5]["keep"] and not got[5]["ok_repetition"]
    assert got[6]["keep"]

    # Latin docs judge identically with the lane on or off
    latin = df.filter("doc_id = 6")
    with_lane = quality_filter(
        latin, unsegmented_markers=UNSEGMENTED_FUNCTION_MARKERS
    ).collect()
    without = quality_filter(latin).collect()
    assert [tuple(r) for r in with_lane] == [tuple(r) for r in without]


def test_korean_prose_passes_multilingual_gate(spark):
    """Korean is space-delimited but particle-agglutinating: the
    committed standalone closed-class items (KOREAN_STOPWORDS) carry
    the naturalness signal through the ordinary token rule."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        multilingual_stopwords,
        quality_filter,
    )

    ko = ("과학자들은 바다가 예상보다 빠르게 따뜻해지고 있다는 사실을 "
          "발견했다 그리고 이것은 모든 국가에 커다란 문제가 되리라고 "
          "내다봤다 우리는 함께 해결책을 찾아야 한다고 말했다 기후변화 "
          "때문에 상황은 점점 나빠지고 있다")
    df = spark.createDataFrame([(1, ko)], "doc_id long, text string")
    [row] = quality_filter(df, stopwords=multilingual_stopwords()).collect()
    assert row["ok_stopwords"] and row["keep"], dict(row.asDict())


def test_unsegmented_lane_composes_instead_of_replacing(spark):
    """Review finding: the lane must UNION evidence, not swap rule sets
    at the 30% cliff — a mixed page whose English prose passes the word
    rules keeps passing even when its marker-less CJK block crosses the
    dominance line; pure-CJK repeated-bigram spam still fails; admitted
    CJK docs report chars-as-tokens counts instead of n_tokens~1."""
    from polygon_io_data_ingestion_pipeline_spark.functions.script_families import (
        UNSEGMENTED_FUNCTION_MARKERS,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        multilingual_stopwords,
        quality_filter,
    )

    english = ("the committee said that it would publish the results of "
               "the study next week and most of the members were in "
               "favour of the proposal so the work continues")
    cjk_list = "科鯨山火水木金土日月車馬魚鳥石田力刀弓玉貝" * 16  # marker-less
    mixed = english + " " + cjk_list  # CJK >= 30% of characters
    zh = ("科学家发现海洋变暖的速度比他们想象的要快这对所有国家来说都是"
          "一个问题因为气候变化的影响正在不断加剧而且没有任何放缓的迹象")
    df = spark.createDataFrame(
        [(1, mixed), (2, zh)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in quality_filter(
            df,
            stopwords=multilingual_stopwords(),
            unsegmented_markers=UNSEGMENTED_FUNCTION_MARKERS,
        ).collect()
    }
    assert got[1]["keep"], dict(got[1].asDict())  # English evidence holds
    # chars-as-tokens: the zh page reports ~its character count
    assert got[2]["n_tokens"] >= 50


def test_incidental_cjk_keeps_honest_token_count(spark):
    """Round-11 advisor finding: with unsegmented_markers on, the
    chars-as-tokens addition applied to EVERY doc — a mostly-Latin page
    with a few incidental CJK characters got an inflated n_tokens in
    downstream size stats.  The addition must gate on the unsegmented
    dominance predicate."""
    from polygon_io_data_ingestion_pipeline_spark.functions.script_families import (
        UNSEGMENTED_FUNCTION_MARKERS,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        multilingual_stopwords,
        quality_filter,
    )

    en_with_cjk = (
        "the committee said that it would publish the results of the "
        "study of 東京 next week and most of the members were in favour "
        "of the proposal so the work continues as before"
    )
    n_words = len(en_with_cjk.split())
    zh = ("科学家发现海洋变暖的速度比他们想象的要快这对所有国家来说都是"
          "一个问题因为气候变化的影响正在不断加剧而且没有任何放缓的迹象")
    df = spark.createDataFrame(
        [(1, en_with_cjk), (2, zh)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in quality_filter(
            df,
            stopwords=multilingual_stopwords(),
            unsegmented_markers=UNSEGMENTED_FUNCTION_MARKERS,
        ).collect()
    }
    # Latin-dominant: honest whitespace count, not words + 2 CJK chars
    assert got[1]["n_tokens"] == n_words
    assert got[1]["keep"]
    # unsegmented-dominant: chars-as-tokens still applies
    assert got[2]["n_tokens"] >= 50


def test_lao_myanmar_khmer_pass_unsegmented_gate(spark):
    """Round 12: Lao, Myanmar and Khmer are unsegmented scripts too —
    the same silently-rejected-at-the-gate shape CJK/Thai had for 11
    rounds.  Their ranges joined UNSEGMENTED_SCRIPT_CLASS and their
    function markers joined UNSEGMENTED_FUNCTION_MARKERS; script-pure
    marker-bearing prose routes through the char lane and keeps."""
    from polygon_io_data_ingestion_pipeline_spark.functions.script_families import (
        UNSEGMENTED_FUNCTION_MARKERS,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        multilingual_stopwords,
        quality_filter,
        unsegmented_dominant,
    )

    lo = ("ປະເທດລາວມີວັດທະນະທໍາທີ່ເກົ່າແກ່ແລະສວຍງາມຫຼາຍຄົນມັກເດີນທາງໄປທ່ຽວ"
          "ຊົມທໍາມະຊາດຂອງພູເຂົາແລະແມ່ນໍ້າໃນລະດູຝົນອາກາດຈະເຢັນສະບາຍແລະມີຝົນ")
    my = ("မြန်မာနိုင်ငံသည်ရှေးဟောင်းယဉ်ကျေးမှုများနှင့်သဘာဝအလှအပများရှိသည်"
          "ခရီးသွားများသည်တောင်များနှင့်မြစ်များကိုကြည့်ရှုရန်နှစ်စဉ်လာရောက်")
    km = ("ប្រទេសកម្ពុជាមានវប្បធម៌ចាស់និងស្រស់ស្អាតមនុស្សជាច្រើនចូលចិត្តធ្វើ"
          "ដំណើរទៅមើលធម្មជាតិរបស់ភ្នំនិងទន្លេក្នុងរដូវវស្សាអាកាសធាតុត្រជាក់")
    df = spark.createDataFrame(
        [(1, lo), (2, my), (3, km)], "doc_id long, text string"
    )
    dom = {r["doc_id"]: r["d"] for r in df.select(
        "doc_id", unsegmented_dominant("text").alias("d")).collect()}
    assert dom == {1: True, 2: True, 3: True}
    got = {
        r["doc_id"]: r["keep"]
        for r in quality_filter(
            df,
            stopwords=multilingual_stopwords(),
            unsegmented_markers=UNSEGMENTED_FUNCTION_MARKERS,
        ).collect()
    }
    assert got == {1: True, 2: True, 3: True}


def test_script_langid_labels_lo_my_km(spark):
    """With the round-12 lane extension, script implies language 1:1
    for Lao/Myanmar/Khmer — admitted pages get their own labels instead
    of falling through to the Latin keyword heuristic."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        predicted_lang_script,
    )

    rows = [
        (1, "ປະເທດລາວມີວັດທະນະທໍາທີ່ເກົ່າແກ່ແລະສວຍງາມຫຼາຍຄົນມັກເດີນທາງ"),
        (2, "မြန်မာနိုင်ငံသည်ရှေးဟောင်းယဉ်ကျေးမှုများနှင့်သဘာဝအလှအပများရှိသည်"),
        (3, "ប្រទេសកម្ពុជាមានវប្បធម៌ចាស់និងស្រស់ស្អាតមនុស្សជាច្រើនចូលចិត្ត"),
        (4, "นักวิทยาศาสตร์พบว่ามหาสมุทรกำลังอุ่นขึ้นเร็วกว่าที่พวกเขาคิด"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", predicted_lang_script("text").alias("lang")
        ).collect()
    }
    assert got == {1: "lo", 2: "my", 3: "km", 4: "th"}
