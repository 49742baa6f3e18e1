"""Distributed n-gram language-model quality scoring — the CCNet
recipe (Wenzek et al. 2020: score crawl text by the perplexity of an LM
trained on a clean REFERENCE corpus; low-quality/gibberish pages score
high) with BOTH phases in-engine: the model is trained as DataFrames
(token/bigram count tables), and scoring is join-based — no KenLM
binary, no model file on the driver, no UDFs.

This is the cross-corpus sibling of ``operators/text.py``'s
``unigram_logprob`` / ``bigram_logprob`` (which score a corpus under
its OWN distribution): a separate training corpus is what makes the
score a quality signal rather than a typicality signal, and it forces
the two backoff cases self-scoring never hits — an unseen bigram under
a seen context, and a wholly unseen context word.

Model = add-k-smoothed bigram LM over whitespace tokens (lowercased):

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1 .) + k * V)

with ``V`` = training vocabulary size (distinct tokens), an unseen
bigram under a seen context backing off to ``k / (c(w1 .) + k * V)``
and an unseen context to the uniform ``1 / V``.  Documents are scored
by average negative log-probability per bigram (cross-entropy, nats) —
the monotone core of perplexity (``ppl = exp(H)``) without the final
``exp`` so engine-parity audits compare sums of logs, not their
exponentials.

Scale shape: training is two partial-agg shuffles (bigram counts,
context counts) plus a one-row vocab aggregate; scoring is two
equi-joins of the document bigram stream against the count tables
(shuffle joins on the n-gram key — the model is O(corpus bigrams) and
is deliberately NEVER broadcast or collected; AQE converts the join to
broadcast by itself when a small reference makes the model tiny) and
one per-document partial agg.  Everything is native expressions inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigram_structs(toks: Column) -> Column:
    """Array of (w1, w2) structs over a token array — empty when the
    document has fewer than two tokens (guarded: sequence() would
    otherwise generate a DESCENDING range for short docs)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array())


def _toks(text_col: str, tokenizer: str = "word") -> Column:
    if tokenizer == "auto":
        # script-aware route (round 12): unsegmented-dominant docs
        # (Han/kana/Thai) tokenize as lowercased character BIGRAMS —
        # whitespace-split makes a whole CJK sentence ONE token, so the
        # LM would smooth nearly every position as OOV and the quality
        # signal collapses to the smoothing constant
        from .text import script_tokens

        return script_tokens(text_col, 2, lower=True)
    from .text import validate_tokenizer

    validate_tokenizer(tokenizer)
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def ngram_lm_train(
    ref: DataFrame, text_col: str = "text", tokenizer: str = "word"
) -> dict[str, DataFrame]:
    """Train the bigram model on a reference corpus: returns the three
    count tables the scorer joins against —

    - ``bigrams``: (w1, w2, n12)
    - ``contexts``: (w1, n1) with n1 = sum of n12 over the context
      (so probabilities are properly normalized per context)
    - ``vocab``: single row (v_size,)

    Counts are exact integers; smoothing happens at SCORING time so one
    trained model serves any ``add_k``.  ``tokenizer='auto'`` routes
    unsegmented-script docs through char-bigram tokens — train and
    score must use the SAME tokenizer."""
    base = ref.select(_toks(text_col, tokenizer).alias("_toks"))
    pairs = base.select(F.explode(_bigram_structs(F.col("_toks"))).alias("_p")).select(
        F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    contexts = bigrams.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = (
        base.select(F.explode("_toks").alias("_t"))
        .agg(F.countDistinct("_t").alias("v_size"))
    )
    return {"bigrams": bigrams, "contexts": contexts, "vocab": vocab}


def ngram_lm_cross_entropy(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
    tokenizer: str = "word",
) -> DataFrame:
    """Score every document by average bigram negative log-probability
    (cross-entropy in nats) under the trained model.  Returns
    ``(id_col, n_bigrams, cross_entropy)`` — ``cross_entropy`` is NULL
    for documents with fewer than two tokens (nothing to score), and is
    rounded to 6 decimals so a DuckDB audit of the identical formula
    renders the same value.

    Typical gate: drop documents whose cross-entropy exceeds a
    per-language quantile of the reference's own score distribution
    (CCNet keeps the best-scoring tercile)."""
    k = float(add_k)
    doc_pairs = docs.select(
        F.col(id_col),
        F.explode_outer(_bigram_structs(_toks(text_col, tokenizer))).alias("_p"),
    ).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    joined = (
        doc_pairs.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["contexts"], ["w1"], "left")
        .crossJoin(F.broadcast(model["vocab"]))
    )
    logp = F.when(
        F.col("n1").isNotNull(),
        F.log(
            (F.coalesce(F.col("n12"), F.lit(0)) + F.lit(k))
            / (F.col("n1") + F.lit(k) * F.col("v_size"))
        ),
    ).otherwise(-F.log(F.col("v_size").cast("double")))
    # the unigram_logprob engine-parity discipline: each ln is quantized
    # to 1e-6 (micro-nats) and the per-doc total is an EXACT integer
    # sum, so the one last-ulp-engine-dependent primitive (ln) is
    # re-quantized before any aggregation a DuckDB audit replays
    slp = F.round(logp * 1e6, 0).cast("long")
    scored = joined.withColumn(
        "_slp", F.when(F.col("w1").isNotNull(), slp)
    )
    per = scored.groupBy(id_col).agg(
        F.count("_slp").alias("n_bigrams"), F.sum("_slp").alias("_s")
    )
    return per.select(
        id_col,
        "n_bigrams",
        F.when(
            F.col("n_bigrams") > 0,
            F.round(-F.col("_s") / F.lit(1e6) / F.col("n_bigrams"), 6),
        ).alias("cross_entropy"),
    )


def _ngram_rows(toks: Column, order: int) -> Column:
    """Array of (w, ctx1, ..., ctx{order-1}) structs, one per token
    position: ``ctxj`` = the space-joined j previous tokens, NULL when
    the position has fewer than j predecessors (document start).  The
    NULL is load-bearing: a boundary-missing context must fall through
    to the lower order WITHOUT the backoff penalty, and the scorer
    branches on exactly this nullity."""
    n = F.size(toks)

    def build(i: Column) -> Column:
        parts = [F.element_at(toks, i + 1).alias("w")]
        for j in range(1, order):
            ctx = F.when(i >= j, F.array_join(F.slice(toks, i - j + 1, j), " "))
            parts.append(ctx.alias(f"ctx{j}"))
        return F.struct(*parts)

    return F.when(
        n >= 1, F.transform(F.sequence(F.lit(0), n - 1), build)
    ).otherwise(F.array())


def ngram_lm_train_counts(
    ref: DataFrame, text_col: str = "text", order: int = 3,
    tokenizer: str = "word",
) -> dict:
    """Count tables for an order-``order`` stupid-backoff LM (Brants et
    al. 2007, "Large Language Models in Machine Translation" — the
    web-scale smoothing: relative frequency when the n-gram is seen,
    else a fixed-penalty fall-through to the next lower order; no
    discounting pass, so training stays per-order partial-agg
    counting).

    Returns ``{"grams": {k: (ctx, w, n)}, "ctx": {k: (ctx, nc)},
    "totals": 1-row (total, v_size)}`` — grams[1] has ctx='' (the
    unigram context is the whole corpus)."""
    base = ref.select(_toks(text_col, tokenizer).alias("_toks"))
    rows = base.select(
        F.explode(_ngram_rows(F.col("_toks"), order)).alias("_g")
    ).select("_g.*")
    grams: dict[int, DataFrame] = {}
    ctx: dict[int, DataFrame] = {}
    for k in range(1, order + 1):
        ctx_col = F.lit("") if k == 1 else F.col(f"ctx{k - 1}")
        gk = (
            rows.filter(F.lit(True) if k == 1 else ctx_col.isNotNull())
            .groupBy(ctx_col.alias("ctx"), F.col("w"))
            .agg(F.count("*").alias("n"))
        )
        grams[k] = gk
        ctx[k] = gk.groupBy("ctx").agg(F.sum("n").alias("nc"))
    totals = rows.agg(
        F.count("*").alias("total"), F.countDistinct("w").alias("v_size")
    )
    return {"grams": grams, "ctx": ctx, "totals": totals}


def stupid_backoff_score(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    tokenizer: str = "word",
) -> DataFrame:
    """Per-document average negative log stupid-backoff score (nats) —
    the quality signal of a web-scale n-gram LM without a discounting
    pass.  Per token: relative frequency under the LONGEST seen
    context; each backoff from a context that EXISTS in the document
    but is unseen in the model multiplies by ``alpha`` (0.4, the
    published constant); a context missing because the document just
    started falls through without penalty; an out-of-vocabulary token
    bottoms out at ``1 / (total + v_size)``.

    Scale shape: the document token stream left-joins each order's
    gram and context tables on the (ctx, w) / (ctx) keys — 2 x order
    equi-joins, model never broadcast or collected (AQE does so by
    itself when a small reference makes it tiny), one per-document
    partial agg; the per-token log is quantized to micro-nats and
    integer-summed (the engine-parity discipline).  Returns
    ``(id_col, n_tokens, avg_neg_logscore)`` with NULL score for
    empty/NULL documents."""
    order = max(model["grams"])
    doc_rows = docs.select(
        F.col(id_col),
        F.explode_outer(_ngram_rows(_toks(text_col, tokenizer), order)).alias("_g"),
    ).select(id_col, "_g.*")
    j = doc_rows
    for k in range(1, order + 1):
        # the join key for a missing context is a sentinel that matches
        # no real ctx (real contexts are space-joined non-empty tokens,
        # never the single space) — NULL itself would never equi-match,
        # but an explicit sentinel keeps the intent readable
        ctx_expr = (
            F.lit("") if k == 1 else F.coalesce(F.col(f"ctx{k - 1}"), F.lit(" "))
        )
        gk = model["grams"][k].select(
            F.col("ctx").alias(f"_c{k}"),
            F.col("w").alias(f"_w{k}"),
            F.col("n").alias(f"_n{k}"),
        )
        ck = model["ctx"][k].select(
            F.col("ctx").alias(f"_cc{k}"), F.col("nc").alias(f"_nc{k}")
        )
        j = (
            j.join(
                gk,
                (ctx_expr == F.col(f"_c{k}"))
                & (F.col("w") == F.col(f"_w{k}")),
                "left",
            )
            .join(ck, ctx_expr == F.col(f"_cc{k}"), "left")
            .drop(f"_c{k}", f"_w{k}", f"_cc{k}")
        )
    j = j.crossJoin(F.broadcast(model["totals"]))
    # innermost: unigram relative frequency, OOV floor
    score = F.when(
        F.col("_n1").isNotNull(),
        F.col("_n1").cast("double") / F.col("_nc1"),
    ).otherwise(F.lit(1.0) / (F.col("total") + F.col("v_size")))
    for k in range(2, order + 1):
        ctx_present = F.col(f"ctx{k - 1}").isNotNull()
        score = F.when(
            F.col(f"_n{k}").isNotNull(),
            F.col(f"_n{k}").cast("double") / F.col(f"_nc{k}"),
        ).otherwise(
            F.when(ctx_present, F.lit(float(alpha)) * score).otherwise(score)
        )
    slp = F.round(F.log(score) * 1e6, 0).cast("long")
    scored = j.withColumn("_slp", F.when(F.col("w").isNotNull(), slp))
    per = scored.groupBy(id_col).agg(
        F.count("_slp").alias("n_tokens"), F.sum("_slp").alias("_s")
    )
    return per.select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(-F.col("_s") / F.lit(1e6) / F.col("n_tokens"), 6),
        ).alias("avg_neg_logscore"),
    )
