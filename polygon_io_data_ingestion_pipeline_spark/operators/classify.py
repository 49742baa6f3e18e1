"""In-engine supervised text classification — the "model-based quality
filter" of LLM corpus pipelines (GPT-3's WebText-vs-CommonCrawl linear
classifier, CCNet's fastText gate, FineWeb-Edu's scorer): train a
classifier on labeled reference corpora and score every crawl document,
with BOTH phases as DataFrame programs.  No sklearn/fastText binary, no
model file on the driver, no UDFs.

The model is multinomial Naive Bayes over whitespace tokens (lowercased
— the ``ngram_lm`` tokenizer, so the LM gate and the classifier gate
see the same token stream):

    log p(label | doc) ∝ log p(label) + Σ_t log p(t | label)
    p(t | label) = (c(label, t) + k) / (c(label, ·) + k·V)

with ``V`` = training vocabulary size and add-k smoothing applied at
SCORING time (training stores exact integer counts, so one trained
model serves any ``add_k``).  Out-of-vocabulary tokens smooth the same
way — ``k / (c(label, ·) + k·V)`` — which preserves the classic NB
property that OOV mass slightly favors the label with the smaller
training corpus rather than being dropped.

Naive Bayes is the aggregation-native member of the linear-classifier
family (its decision function is a per-token log-odds sum, exactly what
fastText computes after training): training is ONE partial-agg shuffle
over (label, token) plus an L-row label summary, and scoring is one
equi-join of the document token stream against the count table — the
model is O(training vocabulary) and is deliberately NEVER collected or
broadcast by hand (AQE broadcasts it by itself when the reference is
small).  Everything stays native expressions inside whole-stage
codegen.

Engine-parity discipline (shared with ``ngram_lm`` / ``unigram_logprob``):
every ``ln`` is quantized to micro-nats (round(x·1e6) as BIGINT) before
any aggregation, so per-document totals are exact integer sums a DuckDB
audit replays bit-for-bit, association order notwithstanding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ngram_lm import _toks
from .text import spread


def nb_train(
    labeled: DataFrame, label_col: str = "label", text_col: str = "text"
) -> dict[str, DataFrame]:
    """Train multinomial NB on a labeled corpus: returns the count
    tables the scorer joins against —

    - ``token_counts``: (label, token, n) exact token counts;
    - ``label_totals``: (label, n_tokens, n_docs) — per-label token
      mass (denominator) and document count (prior numerator), computed
      from the SAME pass so labels whose documents are all empty still
      carry a prior;
    - ``stats``: single row (v_size,) — distinct training tokens across
      all labels.

    Binary quality gates train this with two references under labels
    like ``good``/``bad`` (see ``nb_log_odds``); the multiclass scorer
    (``nb_score``) handles any label arity.  The summary tables derive
    from ``token_counts``, so persisting that one frame (``nb_save``
    does) pays the tokenize pass once across all three."""
    # spread BEFORE the tokenize+explode (guide-§2.5 discipline shared
    # with the dedup family): a reference corpus in few dense files
    # otherwise tokenizes on as many tasks. No-op at scale.
    base = spread(labeled.select(F.col(label_col).alias("label"), F.col(text_col))).select(
        "label", _toks(text_col).alias("_toks")
    )
    tok_rows = base.select("label", F.explode("_toks").alias("token"))
    token_counts = tok_rows.groupBy("label", "token").agg(
        F.count("*").alias("n")
    )
    # label_totals and stats DERIVE from token_counts (not from fresh
    # passes over the corpus): with token_counts persisted — nb_save
    # does — the expensive tokenize+explode lineage runs ONCE for all
    # three tables; only the cheap label-only doc count (column-pruned,
    # no tokenize) touches the corpus again.  Labels whose documents
    # are all empty carry a prior via the doc-count side (token mass
    # coalesces to 0 — the prior-only contract).
    doc_counts = base.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    tok_totals = token_counts.groupBy("label").agg(
        F.sum("n").alias("_nt")
    )
    label_totals = doc_counts.join(tok_totals, "label", "left").select(
        "label",
        F.coalesce(F.col("_nt"), F.lit(0)).alias("n_tokens"),
        "n_docs",
    )
    stats = token_counts.agg(F.countDistinct("token").alias("v_size"))
    return {
        "token_counts": token_counts,
        "label_totals": label_totals,
        "stats": stats,
    }


def nb_merge(*models: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Combine trained models by summing their exact count tables — NB
    is a mergeable aggregate, so training distributes trivially: train
    per shard / per day / per source, merge, serve.  The result is
    EXACTLY the model ``nb_train`` would produce on the concatenated
    corpora (counts are additive; the vocabulary size is recomputed
    from the merged token counts, since distinct counts do not add).
    An incremental update is ``nb_merge(old_model, nb_train(new))``.

    Shape: one unionByName + partial-agg shuffle per table family; the
    vocab aggregate is a 1-row reduction of the merged counts."""
    if not models:
        raise ValueError("nb_merge: at least one model required")
    tc = models[0]["token_counts"]
    lt = models[0]["label_totals"]
    for m in models[1:]:
        tc = tc.unionByName(m["token_counts"])
        lt = lt.unionByName(m["label_totals"])
    token_counts = tc.groupBy("label", "token").agg(F.sum("n").alias("n"))
    label_totals = lt.groupBy("label").agg(
        F.sum("n_tokens").alias("n_tokens"), F.sum("n_docs").alias("n_docs")
    )
    stats = token_counts.agg(F.countDistinct("token").alias("v_size"))
    return {
        "token_counts": token_counts,
        "label_totals": label_totals,
        "stats": stats,
    }


def nb_save(model: dict[str, DataFrame], path: str) -> None:
    """Persist a trained model as three parquet tables under ``path``
    (``token_counts/``, ``label_totals/``, ``stats/``) — the model
    lifecycle a real pipeline needs: train once on the big reference
    corpora, then serve the SAME counts in later batch runs and in the
    streaming ingest (``streaming/crawl_stream.py`` takes the loaded
    model).  Tables are plain parquet, so the saved model is also
    auditable with any SQL engine.

    ``token_counts`` is persisted for the duration of the save: the
    summary tables derive from it (see ``nb_train``), so the reference
    corpora are tokenized once, not once per table."""
    import os

    model["token_counts"].persist()
    try:
        for name in ("token_counts", "label_totals", "stats"):
            model[name].write.mode("overwrite").parquet(
                os.path.join(path, name)
            )
    finally:
        model["token_counts"].unpersist()


def nb_load(spark, path: str) -> dict[str, DataFrame]:
    """Load a model saved by :func:`nb_save`.  Returns the same dict
    shape ``nb_train`` produces; scoring joins read the parquet tables
    directly (callers gating many batches should ``persist()`` the
    three frames once — they are O(training vocabulary))."""
    import os

    return {
        name: spark.read.parquet(os.path.join(path, name))
        for name in ("token_counts", "label_totals", "stats")
    }


def nb_persist(model: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Persist the three model frames IN PLACE and materialize them
    eagerly (one bounded O(training-vocabulary) scan) so every later
    consumer — a long stream gating hundreds of batches — reads the
    cache instead of re-scanning the model parquet per batch.  Pair
    with :func:`nb_unpersist` when the stream ends."""
    for name in ("token_counts", "label_totals", "stats"):
        model[name] = model[name].persist()
        model[name].count()  # eager: the first batch must not pay the scan
    return model


def nb_unpersist(model: dict[str, DataFrame]) -> None:
    """Release frames persisted by :func:`nb_persist`."""
    for name in ("token_counts", "label_totals", "stats"):
        model[name].unpersist()


def nb_require_labels(
    model: dict[str, DataFrame], labels: tuple[str, ...] | list[str]
) -> None:
    """Fail LOUDLY when the model was not trained on ``labels``.

    ``nb_log_odds`` returns NULL for labels absent from the model, and
    every gate treats NULL as "cannot judge" (keep) — so a model saved
    with the wrong labels (anything but the gate's good/bad) would
    silently keep everything with dropped=0.  Gate setup calls this
    once; ``label_totals`` is one row per label, so the collect is
    bounded by the label count (single digits)."""
    # bounded: label_totals holds one row per trained label
    present = {r["label"] for r in model["label_totals"].collect()}
    missing = [l for l in labels if l not in present]
    if missing:
        raise ValueError(
            f"classifier model lacks required labels {missing}; trained "
            f"labels are {sorted(present)} — a gate on absent labels "
            "would silently keep every document"
        )


def _per_label_totals(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str,
    id_col: str,
    add_k: float,
) -> DataFrame:
    """(id, label, prior_micro, n_tok, tot) — one row per document per
    trained label; ``tot`` = prior + Σ token log-likelihoods in exact
    integer micro-nats.  Shared by the multiclass argmax and the binary
    log-odds reductions.

    Shape: explode_outer keeps empty/NULL documents (one NULL-token row
    each); the L-row label summary (with its precomputed prior and the
    per-label unseen-token likelihood) attaches via a broadcast cross
    join — the same condition-less 1-small-build-side BNLJ the LM
    scorers use for their scalar tables; the PRE-QUANTIZED per-(label,
    token) likelihood table attaches via a (label, token) equi-join, so
    the per-occurrence work is a join probe + integer sum with no
    transcendental math on the corpus-sized side."""
    k = float(add_k)
    pri = (
        model["label_totals"]
        .crossJoin(
            F.broadcast(
                model["label_totals"].agg(F.sum("n_docs").alias("_nd"))
            )
        )
        .crossJoin(F.broadcast(model["stats"]))
        .select(
            "label",
            F.col("n_tokens").alias("_lt"),
            F.col("v_size"),
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("_nd")) * 1e6, 0
            )
            .cast("long")
            .alias("prior_micro"),
        )
    )
    # pri is consumed twice below (the likelihood table and the
    # unseen-token defaults) and its lineage includes a corpus-sized
    # doc-count pass (label_totals); with no cross-branch CSE that pass
    # would run once per consumer. Materialize the L-row summary once —
    # LAZILY (eager=False): the first action still checkpoints it
    # exactly once, but building the frame launches no Spark jobs, so
    # callers that construct-but-never-execute a scorer pay nothing.
    pri = pri.localCheckpoint(eager=False)
    # The per-token log-likelihood depends ONLY on model quantities
    # ((label, token) count, label token mass, vocabulary size), so
    # compute it ONCE per model row — a vocabulary-sized table — rather
    # than re-evaluating log()/round() for every token OCCURRENCE x
    # label in the corpus (guide §4 spirit at the expression level: at
    # 100 TB, occurrences outnumber the vocabulary by many orders).
    # Arithmetic is bit-identical: the same double inputs flow through
    # the same log -> x1e6 -> round -> cast(long) chain, evaluated on
    # the model side instead of per scored row.
    denom = F.col("_lt") + F.lit(k) * F.col("v_size")
    # degenerate empty-vocabulary model (a training corpus with no
    # tokens at all): the likelihood term is undefined, so every label
    # contributes 0 and prediction falls back to priors alone — a loud
    # DIVIDE_BY_ZERO under ANSI mode otherwise
    lp_seen = F.when(
        F.col("v_size") > 0, F.log((F.col("n") + F.lit(k)) / denom)
    ).otherwise(F.lit(0.0))
    lp_unseen = F.when(
        F.col("v_size") > 0, F.log(F.lit(k) / denom)
    ).otherwise(F.lit(0.0))
    lp_tbl = (
        model["token_counts"]
        .join(F.broadcast(pri.select("label", "_lt", "v_size")), "label")
        .select(
            "label",
            "token",
            F.round(lp_seen * 1e6, 0).cast("long").alias("_lp"),
        )
    )
    pri_dflt = pri.select(
        "label",
        "prior_micro",
        F.round(lp_unseen * 1e6, 0).cast("long").alias("_dflt"),
    )
    # project to the two needed columns, then spread before the
    # tokenize+explode: the scoring fold (explode × L labels + the
    # count-table join) is the per-document cost of the whole gate and
    # must not serialize on a one-split scan (no-op at 100 TB).
    d = spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode_outer(_toks(text_col)).alias("token")
    )
    # Aggregate to per-(doc, token) COUNTS before the ×L label fan-out
    # (guide §2.3/§2.4): natural text repeats tokens within a document,
    # so the count-table join probes once per DISTINCT doc-token
    # instead of once per occurrence, and when the model is too big for
    # AQE to broadcast (the 100 TB shuffle-join case) the corpus side
    # of that (label, token) exchange shrinks by the same repeat
    # factor.  Arithmetic commutes exactly: Σ_occurrences slp =
    # Σ_distinct slp·c in integer micro-nats, so results are
    # bit-identical.  An empty/NULL document keeps its single
    # NULL-token row (count 1) through the groupBy.
    dt = d.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_c"))
    rows = dt.crossJoin(F.broadcast(pri_dflt)).join(
        lp_tbl, ["label", "token"], "left"
    )
    # a token absent from the label's count table scored
    # log((0 + k) / denom) before — exactly the per-label _dflt
    slp = F.when(
        F.col("token").isNotNull(), F.coalesce(F.col("_lp"), F.col("_dflt"))
    )
    return (
        rows.withColumn("_slp", slp)
        .groupBy(id_col, "label", "prior_micro")
        .agg(
            # token-occurrence count / likelihood sum, re-weighted by
            # the per-(doc, token) multiplicity; NULL-token rows (empty
            # docs) contribute 0 / NULL exactly as the row-per-
            # occurrence form did
            F.coalesce(
                F.sum(
                    F.when(F.col("token").isNotNull(), F.col("_c")).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            ).alias("n_tok"),
            F.coalesce(F.sum(F.col("_slp") * F.col("_c")), F.lit(0)).alias(
                "_lik"
            ),
        )
        .withColumn("tot", F.col("prior_micro") + F.col("_lik"))
    )


def nb_score(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Multiclass prediction: ``(id_col, n_tokens, pred_label, margin)``.

    ``pred_label`` = argmax label posterior (ties break to the
    lexicographically smallest label — deterministic across engines and
    re-runs); ``margin`` = best minus second-best log-posterior in nats
    (rounded to 6 decimals), the standard abstention/confidence signal —
    NULL when the model has a single label.  Documents with no tokens
    (empty/NULL text) are not classifiable: NULL prediction and margin,
    ``n_tokens`` 0.

    The argmax runs as a row_number window over the L rows per document
    (L = label count, single digits in practice) — partitioned by the
    document key, so no global sort and no skew beyond L."""
    per = _per_label_totals(docs, model, text_col, id_col, add_k)
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tot"), F.asc("label")
    )
    ranked = per.withColumn("_rn", F.row_number().over(w))
    out = ranked.groupBy(id_col).agg(
        F.max("n_tok").alias("n_tokens"),
        F.max(F.when(F.col("_rn") == 1, F.col("label"))).alias("_pred"),
        F.max(F.when(F.col("_rn") == 1, F.col("tot"))).alias("_t1"),
        F.max(F.when(F.col("_rn") == 2, F.col("tot"))).alias("_t2"),
    )
    scorable = F.col("n_tokens") > 0
    return out.select(
        id_col,
        "n_tokens",
        F.when(scorable, F.col("_pred")).alias("pred_label"),
        F.when(
            scorable, F.round((F.col("_t1") - F.col("_t2")) / F.lit(1e6), 6)
        ).alias("margin"),
    )


def nb_log_odds(
    docs: DataFrame,
    model: dict[str, DataFrame],
    pos_label: str,
    neg_label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Binary decision function: ``(id_col, n_tokens, log_odds)`` with
    ``log_odds`` = log p(pos|doc) − log p(neg|doc) in nats (rounded to
    6 decimals) — positive means the document reads like the
    ``pos_label`` reference.  This is the exact quantity the GPT-3-style
    quality gate thresholds (keep when log-odds ≥ margin).

    NULL ``log_odds`` for unclassifiable documents (no tokens) AND for
    labels absent from the trained model — callers gating on it should
    treat NULL as "cannot judge" (keep), symmetrical with the LM gate's
    unscorable-docs-keep contract."""
    per = _per_label_totals(docs, model, text_col, id_col, add_k)
    out = per.groupBy(id_col).agg(
        F.max("n_tok").alias("n_tokens"),
        F.max(F.when(F.col("label") == pos_label, F.col("tot"))).alias("_p"),
        F.max(F.when(F.col("label") == neg_label, F.col("tot"))).alias("_n"),
    )
    return out.select(
        id_col,
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round((F.col("_p") - F.col("_n")) / F.lit(1e6), 6),
        ).alias("log_odds"),
    )
