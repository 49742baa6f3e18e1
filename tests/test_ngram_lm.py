"""Cross-corpus n-gram LM quality scoring (the CCNet recipe with both
phases in-engine): reference-trained bigram model, join-based scoring,
add-k backoff for unseen bigrams and unseen contexts, and the micro-nat
quantization that makes a DuckDB audit exact."""

from __future__ import annotations

import math

from polygon_io_data_ingestion_pipeline_spark.operators.ngram_lm import (
    ngram_lm_cross_entropy,
    ngram_lm_train,
)


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def _score(spark, ref_rows, doc_rows, add_k=1.0):
    model = ngram_lm_train(_df(spark, ref_rows))
    got = ngram_lm_cross_entropy(_df(spark, doc_rows), model, add_k=add_k)
    return {r["doc_id"]: (r["n_bigrams"], r["cross_entropy"]) for r in got.collect()}


def test_model_counts_and_hand_computed_score(spark):
    """ref = two docs over a 3-word vocab; score a doc whose bigrams are
    all in-model — cross-entropy must equal the hand-computed
    add-1-smoothed value (quantized to micro-nats per bigram)."""
    ref = [(1, "a b a b"), (2, "b a c")]
    # bigram counts: (a,b)=2 (b,a)=2 (a,c)=1 ; contexts: a->3, b->2 ; V=3
    model_rows = {
        (r["w1"], r["w2"]): r["n12"]
        for r in ngram_lm_train(_df(spark, ref))["bigrams"].collect()
    }
    assert model_rows == {("a", "b"): 2, ("b", "a"): 2, ("a", "c"): 1}

    def q(p):  # per-bigram micro-nat quantization, as the scorer does
        return round(math.log(p) * 1e6)

    def half_up6(x):  # Spark's round() is HALF_UP, Python's is banker's
        return math.floor(x * 1e6 + 0.5) / 1e6

    # doc "a b a": bigrams (a,b), (b,a)
    # p(b|a) = (2+1)/(3+3) = 0.5 ; p(a|b) = (2+1)/(2+3) = 0.6
    want = half_up6(-(q(0.5) + q(0.6)) / 1e6 / 2)
    got = _score(spark, ref, [(10, "A b a")])  # case-folded
    assert got[10] == (2, want)


def test_backoff_unseen_bigram_and_unseen_context(spark):
    """The two cases self-scoring never exercises: a seen context with
    an unseen next word gets k/(n1+kV); an unseen context gets 1/V."""
    ref = [(1, "a b a b"), (2, "b a c")]

    def q(p):
        return round(math.log(p) * 1e6)

    # doc "a a": bigram (a,a) — context a seen (n1=3), pair unseen:
    # p = 1/(3+3)
    got = _score(spark, ref, [(20, "a a"), (21, "z q")])
    assert got[20] == (1, round(-q(1 / 6) / 1e6, 6))
    # doc "z q": context z unseen -> uniform 1/V = 1/3
    assert got[21] == (1, round(-q(1 / 3) / 1e6, 6))


def test_gibberish_scores_worse_than_reference_like_text(spark):
    """The point of the gate: text drawn from the reference's own
    phrasing scores lower cross-entropy than token salad."""
    ref = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog sleeps while the quick fox runs"),
        (3, "a quick fox and a lazy dog play in the sun"),
    ]
    docs = [
        (10, "the quick fox jumps over the lazy dog"),
        (11, "dog the sun lazy a runs brown the while"),
    ]
    got = _score(spark, ref, docs)
    assert got[10][1] < got[11][1]


def test_short_null_docs_contract(spark):
    """Docs with fewer than two tokens keep their row with n_bigrams=0
    and NULL cross-entropy; NULL text likewise."""
    ref = [(1, "a b a")]
    got = _score(spark, ref, [(30, "single"), (31, ""), (32, None)])
    assert got[30] == (0, None)
    assert got[31] == (0, None)
    assert got[32] == (0, None)


def _q(p):
    return round(math.log(p) * 1e6)


def _half_up6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def _backoff(spark, ref_rows, doc_rows, order=3, alpha=0.4):
    from polygon_io_data_ingestion_pipeline_spark.operators.ngram_lm import (
        ngram_lm_train_counts,
        stupid_backoff_score,
    )

    model = ngram_lm_train_counts(_df(spark, ref_rows), order=order)
    got = stupid_backoff_score(_df(spark, doc_rows), model, alpha=alpha)
    return {r["doc_id"]: (r["n_tokens"], r["avg_neg_logscore"]) for r in got.collect()}


def test_stupid_backoff_hand_computed(spark):
    """ref 'a b c'/'a b d': trigram hit, boundary fall-through without
    penalty, unseen-gram backoff WITH penalty, and the OOV floor — each
    against the published stupid-backoff recursion by hand."""
    ref = [(1, "a b c"), (2, "a b d")]
    # counts: uni a2 b2 c1 d1 (total 6, V=4); bi (a,b)=2 /nc(a)=2,
    # (b,c)=1,(b,d)=1 /nc(b)=2; tri ("a b",c)=1,("a b",d)=1 /nc("a b")=2
    got = _backoff(spark, ref, [(10, "a b c"), (11, "b z"), (12, "q b")])
    # "a b c": uni(a)=2/6; bigram(a,b)=1.0 (no ctx2 -> NO penalty);
    # trigram("a b",c)=1/2
    want10 = _half_up6(-(_q(2 / 6) + _q(1.0) + _q(0.5)) / 1e6 / 3)
    assert got[10] == (3, want10)
    # "b z": uni(b)=2/6; ctx 'b' EXISTS but (b,z) unseen and z is OOV:
    # alpha * floor = 0.4 * 1/(6+4)
    want11 = _half_up6(-(_q(2 / 6) + _q(0.4 * 0.1)) / 1e6 / 2)
    assert got[11] == (2, want11)
    # "q b": q OOV floor; ctx 'q' present-in-doc but unseen-in-model:
    # alpha * uni(b)
    want12 = _half_up6(-(_q(0.1) + _q(0.4 * 2 / 6)) / 1e6 / 2)
    assert got[12] == (2, want12)


def test_stupid_backoff_contracts_and_ranking(spark):
    """Empty/NULL docs stay NULL; reference-like text outscores salad
    under the trigram model too."""
    ref = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog sleeps while the quick fox runs"),
    ]
    got = _backoff(
        spark,
        ref,
        [
            (20, "the quick brown fox jumps"),
            (21, "fox the jumps quick the brown"),
            (22, ""),
            (23, None),
        ],
    )
    assert got[20][1] < got[21][1]
    assert got[22] == (0, None)
    assert got[23] == (0, None)


def test_stupid_backoff_matches_python_reference(spark):
    """Property check: the join-cascade scorer equals a direct Python
    restatement of the recursion on random tiny-vocab corpora (tiny so
    seen/unseen/boundary branches all fire)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from polygon_io_data_ingestion_pipeline_spark.operators.ngram_lm import (
        ngram_lm_train_counts,
        stupid_backoff_score,
    )

    VOCAB = ["a", "b", "c"]
    corpus = st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6),
        min_size=1,
        max_size=3,
    )
    target = st.lists(st.sampled_from(VOCAB + ["z"]), min_size=1, max_size=6)

    def ref_score(ref_docs, doc, order=3, alpha=0.4):
        grams: dict[int, dict] = {k: {} for k in range(1, order + 1)}
        total = 0
        vocab = set()
        for toks in ref_docs:
            for i, w in enumerate(toks):
                total += 1
                vocab.add(w)
                for k in range(1, order + 1):
                    if i >= k - 1:
                        ctx = " ".join(toks[i - k + 1 : i]) if k > 1 else ""
                        grams[k][(ctx, w)] = grams[k].get((ctx, w), 0) + 1
        nc = {k: {} for k in grams}
        for k, g in grams.items():
            for (ctx, _w), n in g.items():
                nc[k][ctx] = nc[k].get(ctx, 0) + n
        logs = []
        for i, w in enumerate(doc):
            s = (
                grams[1].get(("", w), 0) / nc[1][""]
                if ("", w) in grams[1]
                else 1.0 / (total + len(vocab))
            )
            for k in range(2, order + 1):
                if i >= k - 1:
                    ctx = " ".join(doc[i - k + 1 : i])
                    if (ctx, w) in grams[k]:
                        s = grams[k][(ctx, w)] / nc[k][ctx]
                    else:
                        s = alpha * s
                # boundary: keep lower-order s, no penalty
            logs.append(round(math.log(s) * 1e6))
        import math as _m

        return len(logs), _m.floor(-sum(logs) / 1e6 / len(logs) * 1e6 + 0.5) / 1e6

    @given(ref_docs=corpus, doc=target)
    @settings(
        max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(ref_docs, doc):
        model = ngram_lm_train_counts(
            _df(spark, [(i, " ".join(t)) for i, t in enumerate(ref_docs)]),
            order=3,
        )
        got = stupid_backoff_score(
            _df(spark, [(0, " ".join(doc))]), model
        ).collect()[0]
        n, ce = ref_score(ref_docs, doc)
        assert got["n_tokens"] == n
        assert got["avg_neg_logscore"] == ce, (ref_docs, doc)

    run()


def test_plan_native_and_model_not_collected(spark):
    """Scoring is join-based: no Python workers, and the model tables
    join by key (the 1-row vocab is the only broadcast)."""
    ref = _df(spark, [(1, "a b c a b")])
    model = ngram_lm_train(ref)
    out = ngram_lm_cross_entropy(_df(spark, [(2, "a b x")]), model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
