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


def _toks(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def ngram_lm_train(
    ref: DataFrame, text_col: str = "text"
) -> dict[str, DataFrame]:
    """Train the bigram model on a reference corpus: returns the three
    count tables the scorer joins against —

    - ``bigrams``: (w1, w2, n12)
    - ``contexts``: (w1, n1) with n1 = sum of n12 over the context
      (so probabilities are properly normalized per context)
    - ``vocab``: single row (v_size,)

    Counts are exact integers; smoothing happens at SCORING time so one
    trained model serves any ``add_k``."""
    base = ref.select(_toks(text_col).alias("_toks"))
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
        F.col(id_col), F.explode_outer(_bigram_structs(_toks(text_col))).alias("_p")
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
