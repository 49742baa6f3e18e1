"""In-engine Naive Bayes text classification (operators/classify.py —
the model-based quality filter): hand-computed posteriors, deterministic
tie-break, the empty/NULL and OOV contracts, binary log-odds
consistency, and the native-plan gate."""

from __future__ import annotations

import math

import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
    nb_log_odds,
    nb_score,
    nb_train,
)

TRAIN = [
    ("good", "the cat sat on the mat"),
    ("good", "a dog and a cat"),
    ("bad", "buy cheap pills now"),
    ("bad", "cheap cheap buy now win"),
]

DOCS = [
    (1, "the cat and the dog"),
    (2, "buy pills cheap"),
    (3, ""),
    (4, None),
    (5, "zzz unknown words only"),
]


def _train(spark, rows=TRAIN):
    return nb_train(
        spark.createDataFrame(rows, "label string, text string")
    )


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(p):  # micro-nat quantization, as the scorer does
    return round(math.log(p) * 1e6)


def _half_up6(x):  # Spark round() is HALF_UP, Python's is banker's
    return math.floor(x * 1e6 + 0.5) / 1e6


def _expected_totals(doc_tokens):
    """Replay the model by hand for the TRAIN fixture: per-label
    (prior + sum of quantized token log-likelihoods) in micro-nats."""
    counts = {"good": {}, "bad": {}}
    for label, text in TRAIN:
        for t in text.split():
            counts[label][t] = counts[label].get(t, 0) + 1
    lt = {lab: sum(c.values()) for lab, c in counts.items()}  # 11 / 9
    vocab = len({t for c in counts.values() for t in c})  # 13
    prior = _q(2 / 4)
    tot = {}
    for lab in counts:
        s = prior
        for t in doc_tokens:
            s += _q((counts[lab].get(t, 0) + 1) / (lt[lab] + vocab))
        tot[lab] = s
    return tot


def test_hand_computed_prediction_and_margin(spark):
    got = {
        r["doc_id"]: r
        for r in nb_score(_docs(spark), _train(spark)).collect()
    }
    for doc_id, text in ((1, DOCS[0][1]), (2, DOCS[1][1])):
        tot = _expected_totals(text.split())
        best, second = sorted(tot.values(), reverse=True)
        pred = max(tot, key=lambda lab: (tot[lab], lab))
        row = got[doc_id]
        assert row["pred_label"] == pred
        assert row["margin"] == _half_up6((best - second) / 1e6)
        assert row["n_tokens"] == len(text.split())
    assert got[1]["pred_label"] == "good"
    assert got[2]["pred_label"] == "bad"


def test_empty_and_null_docs_are_unclassifiable(spark):
    got = {
        r["doc_id"]: r
        for r in nb_score(_docs(spark), _train(spark)).collect()
    }
    for doc_id in (3, 4):
        assert got[doc_id]["n_tokens"] == 0
        assert got[doc_id]["pred_label"] is None
        assert got[doc_id]["margin"] is None


def test_oov_only_doc_still_scores(spark):
    """A wholly out-of-vocabulary document smooths to k/(lt+kV) per
    token — the label with the smaller training mass wins (larger
    per-token OOV probability), it is not dropped or NULLed."""
    got = {
        r["doc_id"]: r
        for r in nb_score(_docs(spark), _train(spark)).collect()
    }
    row = got[5]
    assert row["pred_label"] == "bad"  # lt: bad 9 < good 11
    assert row["n_tokens"] == 4
    assert row["margin"] == pytest.approx(
        _half_up6((_q(1 / 22) - _q(1 / 24)) * 4 / 1e6)
    )


def test_tie_breaks_to_lexicographically_smallest_label(spark):
    model = _train(
        spark, [("alpha", "x y"), ("beta", "x y")]
    )  # identical distributions and priors
    got = nb_score(_docs(spark, [(1, "x y x")]), model).collect()[0]
    assert got["pred_label"] == "alpha"
    assert got["margin"] == 0.0


def test_single_label_model_has_null_margin(spark):
    model = _train(spark, [("only", "x y z")])
    got = nb_score(_docs(spark, [(1, "x y")]), model).collect()[0]
    assert got["pred_label"] == "only"
    assert got["margin"] is None


def test_log_odds_matches_signed_margin_for_binary_model(spark):
    model = _train(spark)
    score = {
        r["doc_id"]: r for r in nb_score(_docs(spark), model).collect()
    }
    odds = {
        r["doc_id"]: r
        for r in nb_log_odds(_docs(spark), model, "good", "bad").collect()
    }
    for doc_id in (1, 2, 5):
        sign = 1 if score[doc_id]["pred_label"] == "good" else -1
        assert odds[doc_id]["log_odds"] == pytest.approx(
            sign * score[doc_id]["margin"]
        )
        assert odds[doc_id]["n_tokens"] == score[doc_id]["n_tokens"]
    for doc_id in (3, 4):
        assert odds[doc_id]["log_odds"] is None


def test_log_odds_null_for_untrained_label(spark):
    got = nb_log_odds(
        _docs(spark, [(1, "the cat")]), _train(spark), "good", "ugly"
    ).collect()[0]
    assert got["log_odds"] is None  # cannot judge -> caller keeps


def test_add_k_changes_smoothing_not_counts(spark):
    """One trained model serves any add_k: with a huge k the smoothed
    distributions converge and the margin shrinks toward zero, without
    retraining."""
    model = _train(spark)
    m1 = nb_score(_docs(spark, [(1, "the cat")]), model).collect()[0]
    m2 = nb_score(
        _docs(spark, [(1, "the cat")]), model, add_k=1000.0
    ).collect()[0]
    assert abs(m2["margin"]) < abs(m1["margin"])


def test_plan_is_native_and_scalable(spark):
    from polygon_io_data_ingestion_pipeline_spark.plans.lint import (
        assert_scalable,
    )

    df = nb_score(_docs(spark), _train(spark))
    findings = assert_scalable(df)  # raises on error-class shapes
    # the L-row label summary attaches via the documented condition-less
    # broadcast; nothing beyond warn-class may appear
    assert all(f.severity == "warn" for f in findings)


# ---------------------------------------------------------------------------
# Hypothesis: the engine vs a pure-Python NB restatement
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# tiny vocab so label distributions actually overlap and ties happen
_WORDS = st.sampled_from(["a", "b", "c"])
_TEXT = st.lists(_WORDS, min_size=0, max_size=6).map(" ".join)
_CORPUS = st.lists(
    st.tuples(st.sampled_from(["g", "h"]), _TEXT), min_size=1, max_size=8
)
_DOCS = st.lists(_TEXT, min_size=1, max_size=6)


def _python_nb(train_rows, doc_texts, add_k=1.0):
    """Independent restatement of the scorer (same micro-nat
    quantization, same tie rule) in plain Python."""
    counts: dict[str, dict[str, int]] = {}
    ndocs: dict[str, int] = {}
    for lab, text in train_rows:
        ndocs[lab] = ndocs.get(lab, 0) + 1
        c = counts.setdefault(lab, {})
        for t in text.split():
            c[t] = c.get(t, 0) + 1
    lt = {lab: sum(c.values()) for lab, c in counts.items()}
    vocab = len({t for c in counts.values() for t in c})
    total = sum(ndocs.values())
    out = {}
    for i, text in enumerate(doc_texts):
        toks = text.split()
        if not toks:
            out[i] = (0, None, None)
            continue
        tot = {}
        for lab in counts:
            s = round(math.log(ndocs[lab] / total) * 1e6)
            for t in toks:
                # empty-vocabulary model: prior-only prediction
                if vocab > 0:
                    s += round(
                        math.log(
                            (counts[lab].get(t, 0) + add_k)
                            / (lt[lab] + add_k * vocab)
                        )
                        * 1e6
                    )
            tot[lab] = s
        order = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))
        margin = (
            math.floor((order[0][1] - order[1][1]) / 1e6 * 1e6 + 0.5) / 1e6
            if len(order) > 1
            else None
        )
        out[i] = (len(toks), order[0][0], margin)
    return out


@given(train=_CORPUS, texts=_DOCS)
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_property_engine_matches_python_restatement(spark, train, texts):
    model = nb_train(
        spark.createDataFrame(train, "label string, text string")
    )
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["pred_label"], r["margin"])
        for r in nb_score(docs, model).collect()
    }
    want = _python_nb(train, texts)
    assert got == want


def test_empty_vocabulary_model_predicts_by_priors(spark):
    """A training corpus with no tokens at all (empty/NULL texts) must
    not raise DIVIDE_BY_ZERO under ANSI mode: the likelihood term is
    undefined, so prediction falls back to priors alone — two docs of
    'g' vs one of 'h' predicts 'g' with margin ln(2/3)-ln(1/3)."""
    model = _train(spark, [("g", ""), ("g", None), ("h", "")])
    got = nb_score(_docs(spark, [(1, "x y")]), model).collect()[0]
    assert got["pred_label"] == "g"
    assert got["margin"] == pytest.approx(
        _half_up6((_q(2 / 3) - _q(1 / 3)) / 1e6)
    )


def test_save_load_roundtrip_scores_identically(spark, tmp_path):
    """nb_save/nb_load: the persisted model (three parquet tables) must
    score exactly like the in-memory one — the train-offline /
    serve-in-stream lifecycle."""
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_load,
        nb_save,
    )

    model = _train(spark)
    nb_save(model, str(tmp_path / "model"))
    loaded = nb_load(spark, str(tmp_path / "model"))
    want = sorted(
        nb_score(_docs(spark), model).collect(),
        key=lambda r: r["doc_id"],
    )
    got = sorted(
        nb_score(_docs(spark), loaded).collect(),
        key=lambda r: r["doc_id"],
    )
    assert got == want


def test_merge_equals_training_on_concatenated_corpus(spark):
    """nb_merge: NB is a mergeable aggregate — per-shard models merged
    must score EXACTLY like one model trained on the concatenation
    (vocab recomputed from merged counts, not summed; a token the
    shards share must not double-count in v_size)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_merge,
    )

    shard1, shard2 = TRAIN[:2], TRAIN[2:]
    merged = nb_merge(
        _train(spark, shard1 + [("bad", "buy now")]),
        _train(spark, shard2 + [("good", "the mat")]),
    )
    whole = _train(spark, shard1 + [("bad", "buy now")] + shard2 + [("good", "the mat")])
    want = sorted(
        nb_score(_docs(spark), whole).collect(), key=lambda r: r["doc_id"]
    )
    got = sorted(
        nb_score(_docs(spark), merged).collect(), key=lambda r: r["doc_id"]
    )
    assert got == want
    # vocab recomputed, not summed: both shards contain 'the' and 'buy'
    v_merged = merged["stats"].collect()[0]["v_size"]
    v_whole = whole["stats"].collect()[0]["v_size"]
    assert v_merged == v_whole


def test_merge_single_and_empty_contracts(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_merge,
    )

    m = _train(spark)
    one = nb_merge(m)
    assert sorted(
        nb_score(_docs(spark), one).collect(), key=lambda r: r["doc_id"]
    ) == sorted(
        nb_score(_docs(spark), m).collect(), key=lambda r: r["doc_id"]
    )
    with pytest.raises(ValueError, match="at least one"):
        nb_merge()


def test_require_labels_fails_loudly_on_wrong_model(spark):
    """nb_require_labels: a model trained on other labels raises at
    gate setup instead of NULL-scoring (and thus silently keeping)
    every document (round-11 ADVICE fix)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_require_labels,
    )

    model = _train(spark)
    nb_require_labels(model, ("good", "bad"))  # trained labels pass
    with pytest.raises(ValueError, match="lacks required labels"):
        nb_require_labels(model, ("good", "spam"))
