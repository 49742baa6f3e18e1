"""Deterministic corpus sampling / split assignment.

Training-data pipelines need reproducible, engine-portable randomness:
every row's fate (train/val/test membership, keep-or-drop under a
mixture weight) must be a pure function of its key, so re-runs,
backfills, and a DuckDB audit of the same parquet all agree. We derive
buckets from md5 of the key — the same construction the RP-LSH planes
use (similarity.py) — rather than ``rand()`` (non-reproducible across
partitionings) or ``hash()`` (engine-specific).

Everything here is a map-side column expression: no shuffle, no state,
no UDF — at 100 TB these run at scan speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key_col: str, salt: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex chars of
    ``salt || key`` as an int, mod n_buckets. Engine-portable (DuckDB:
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % n``)."""
    return F.expr(
        f"CAST(conv(substr(md5('{salt}' || CAST({key_col} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) % {n_buckets}"
    )


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column: 'train' / 'val' / 'test' by deterministic
    hash bucket — the standard leak-proof split (a document's split
    never changes when the corpus around it grows)."""
    b = hash_bucket(key_col, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically:
    ``bucket(key) < round(rate * 10000)``. The per-stratum rates are the
    mixture weights a training recipe assigns to each source; keeping
    the decision keyed (not ``rand()``) makes the sample stable under
    re-partitioning, retries, and incremental re-runs.

    The integer threshold is computed in Python (``int(round(...))``)
    and compared as a literal: thresholding via ``(rate * 10000.0)
    .cast('long')`` would truncate in Spark while a DuckDB audit's CAST
    rounds, so rates whose scaled value is inexact in binary floating
    point (0.07 -> 699.999...) would disagree between engines."""
    b = hash_bucket(key_col, salt, 10000)
    threshold = F.lit(int(round(float(default_rate) * 10000)))
    for stratum, r in sorted(rates.items()):
        thr = int(round(float(r) * 10000))
        threshold = F.when(F.col(stratum_col) == stratum, F.lit(thr)).otherwise(threshold)
    return df.filter(b < threshold)


def mixture_weights(
    df: DataFrame,
    size: Column,
    stratum_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum: the standard
    recipe for balancing a multi-source / multilingual training corpus
    (sample source s with probability proportional to ``p_s ** alpha``,
    ``p_s`` = the source's share of total tokens; ``alpha < 1`` upsamples
    the tail, ``alpha = 1`` is natural frequency). The output feeds
    :func:`stratified_sample` as its per-stratum rates.

    Scale shape: one partial-agg shuffle collapses the corpus to one
    row per stratum (map-side combine does the heavy lifting); the
    global windows that normalize shares run on that collapsed frame —
    O(strata) rows on one reducer, which is the correct plan at any
    corpus size because strata are sources/languages, not documents.

    Engine-portability: shares are rounded before scaling; the
    temperature map uses ``sqrt`` for ``alpha = 0.5`` (IEEE
    correctly-rounded, bit-identical across engines, unlike ``pow``);
    and both normalizations sum exact integers (round(x * 1e6) as
    BIGINT), so a DuckDB audit of the same parquet reproduces every
    weight bit-for-bit. For other alphas ``pow`` may differ in the last
    ULP across engines — fine for training, but not hash-comparable.

    Returns (stratum, n_docs, n_tokens, p_raw, weight).
    """
    per = df.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(size.cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    p_raw = F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6)
    per = per.withColumn("p_raw", p_raw)
    temp = F.sqrt(F.col("p_raw")) if alpha == 0.5 else F.pow(F.col("p_raw"), F.lit(alpha))
    per = per.withColumn("_t", F.round(temp * F.lit(1000000.0), 0).cast("long"))
    return per.select(
        stratum_col,
        "n_docs",
        "n_tokens",
        "p_raw",
        F.round(F.col("_t") / F.sum("_t").over(w), 6).alias("weight"),
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis–Spirakis A-ES scheme): each row gets sort key
    ``u ** (1/w)`` for a per-key uniform ``u``; the top-k keys are a
    weighted sample without replacement. The training-data use: sample
    documents proportional to a quality score or token count while
    keeping the draw reproducible across re-runs, retries, and engines.

    The uniform comes from the row's md5 bucket (same construction as
    :func:`hash_bucket` — never ``rand()``), so the sample is a pure
    function of (key, salt). The sort key is quantized to 9 decimals
    with the row key as tiebreak: ``pow`` may differ in the last ulp
    across engines, and quantize-then-tiebreak makes the selected set
    and order identical everywhere instead of depending on float
    ordering luck (9 decimals: at ulp ~1e-16 the chance any row's
    ROUNDED key differs across engines is ~1e-7, vs ~1e-4 at 12 —
    and ties the quantization does create break on the key). Non-positive weights are excluded (standard A-ES
    domain). One TakeOrdered pass — no shuffle beyond top-k.

    Returns the sampled rows plus the ``sample_key`` column, ordered by
    (sample_key desc, key) — deterministic.
    """
    u = (
        F.expr(
            f"CAST(conv(substr(md5('{salt}' || CAST({key_col} AS STRING)), 1, 12), 16, 10)"
            f" AS DOUBLE)"
        )
        / F.lit(float(1 << 48))
    )
    w = weight.cast("double")
    skey = F.round(F.pow(u, F.lit(1.0) / w), 9)
    out = (
        df.filter(w > 0)
        .withColumn("sample_key", skey)
        .orderBy(F.col("sample_key").desc(), F.col(key_col))
        .limit(k)
    )
    return out


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe split: hash on the near-duplicate CLUSTER, not the
    document, so no two near-duplicates ever straddle train/test.

    ``hash_split`` keyed on the doc id is leak-proof against corpus
    GROWTH but not against near-duplicates: two copies of one document
    hash independently and can land in train and test — the classic
    eval-contamination bug. Here every document inherits its connected
    component's canonical id (``dedup.duplicate_clusters``; singletons
    cluster to themselves) and the split is hashed on THAT key, so a
    whole duplicate class moves as one unit. Deterministic: the
    canonical id is the min member id, stable under partitioning and
    (for dedup-stable corpora) under growth.

    Scale shape: cluster propagation's keyed joins + one broadcast-free
    equi join of docs onto their labels, then the same md5 bucket
    expression as ``hash_split``. Returns ``df`` plus ``cluster_id``
    and ``split`` columns.
    """
    from .dedup import duplicate_clusters

    labels = duplicate_clusters(pairs, all_ids=df.select(id_col), id_col=id_col)
    joined = df.join(labels, id_col)
    b = hash_bucket("cluster_id", salt)
    return joined.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: str = "shuffle0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reproducible global shuffle for training order: every row gets a
    uniform md5 permutation key, a shard, and its position within the
    shard — so data loaders stream ``(shard, pos)`` order and see an
    unbiased, seed-stable permutation of the corpus.

    Training epochs must not read the corpus in ingest order (adjacent
    documents correlate: same crawl, same site, same day), and a true
    global sort of 100 TB just to randomize is absurd. The standard
    answer is sharded shuffling: the md5 key assigns each row a shard
    map-side (uniform by construction), and ONE shuffle keyed on the
    shard orders each shard internally — shards are read independently
    and interleaved by the loader, so no global sort ever exists.
    ``n_shards`` controls the sort granule: pick it so a shard fits an
    executor's spill budget (e.g. 100k shards at 100 TB -> ~1 GB
    sorts). Changing the seed reshuffles; changing the corpus moves
    only the touched rows' positions within their shards.

    Deterministic and engine-portable (md5-derived, the repo's hashing
    idiom): the DuckDB oracle replays bit-for-bit.
    """
    key = F.expr(
        f"CAST(conv(substr(md5('{seed}_' || CAST({id_col} AS STRING)), 1, 15), 16, 10) "
        "AS BIGINT)"
    )
    keyed = df.withColumn("__shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("__shuffle_key"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__shuffle_key", id_col)
    return (
        keyed.withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("__shuffle_key")
    )


def token_budget_mixture(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "mix0",
    n_shards: int = 64,
) -> DataFrame:
    """Assemble a training mixture by TOKEN budget: from each source,
    take documents in a seed-stable uniform-random order until that
    source's token budget is filled — the final "build the mix" step
    downstream of :func:`mixture_weights` (which designs the budgets,
    while this enforces them in actual tokens, not document counts).

    A document is kept while the running token total stays within the
    budget (strict prefix: the first document that would overflow is
    excluded, so a mix never exceeds its budgets). Unlisted sources get
    ``default_budget``.

    Scale shape — the low-cardinality-window trap (a per-source global
    cumsum would shuffle the whole corpus into #sources reducers) is
    avoided with the ``sequence_packing`` two-level prefix sum: the md5
    priority is uniform, so its HIGH BITS are an order-preserving shard
    key; within-(source, shard) cumsums run at sources x n_shards
    parallelism, and the cross-shard offsets come from a window over the
    tiny per-shard totals frame. The result equals the single-window
    cumsum exactly (the oracle states it that way).

    Returns (id, source, n_tokens, cum_tokens) for the selected docs.
    """
    from .text import token_count

    # md5 -> [0, 16^15) priority; high bits shard it ORDER-PRESERVINGLY
    span = (16**15) // n_shards + 1
    pr = F.expr(
        f"CAST(conv(substr(md5('{seed}_' || CAST({id_col} AS STRING)), 1, 15), 16, 10) "
        "AS BIGINT)"
    )
    budget = F.lit(int(default_budget))
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(int(b))).otherwise(budget)
    keyed = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(text_col).alias("n_tokens"),
        pr.alias("__pr"),
        budget.alias("__budget"),
    ).withColumn("__shard", (F.col("__pr") / F.lit(span)).cast("int"))

    w_in = Window.partitionBy(source_col, "__shard").orderBy("__pr", id_col)
    within = keyed.withColumn("__cum_in", F.sum("n_tokens").over(w_in))

    totals = keyed.groupBy(source_col, "__shard").agg(
        F.sum("n_tokens").alias("__shard_tokens")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__shard_tokens").over(w_off), F.lit(0))
    ).select(source_col, "__shard", "__offset")

    out = within.join(offsets, [source_col, "__shard"]).withColumn(
        "cum_tokens", F.col("__offset") + F.col("__cum_in")
    )
    return out.filter(F.col("cum_tokens") <= F.col("__budget")).select(
        id_col, source_col, "n_tokens", "cum_tokens"
    )


def group_capped_sample(
    df: DataFrame,
    cap: int,
    group_col: str = "domain",
    key_col: str = "doc_id",
    salt: str = "domcap",
    order_col: str | None = None,
) -> DataFrame:
    """Hard per-group cap: keep at most ``cap`` rows per group, selected
    by keyed-hash rank — the standard crawl-corpus skew control ("max N
    pages per registrable domain").  Web corpora are Zipfian in domains;
    without a cap a handful of hosts dominate the training mixture.
    The selection is a deterministic function of ``(salt, key)``, so
    re-runs and a DuckDB audit agree row-for-row and the KEPT set for a
    group only changes when that group's membership changes — though
    unlike the rate-based :func:`stratified_sample`, a hard cap is
    necessarily rank-based: new rows hashing below the current
    threshold CAN displace old ones on a re-run over a grown corpus
    (that is the semantics of a cap, not a defect).

    Scale shape: one row_number window over the group key.  Spark's
    WindowGroupLimit optimization (3.5+) pushes the ``rank <= cap``
    filter into a per-map-partition top-``cap`` AHEAD of the exchange,
    so a hot domain ships at most ``cap`` rows per input partition
    instead of materializing millions of rows in one window partition —
    the plan survives Zipfian skew without salting
    (``tests/test_group_cap.py`` pins the WindowGroupLimit node).

    ``order_col``: rank rows per group by that column DESCENDING
    (nulls last, keyed hash tie-break) instead of hash order — the
    graph->selection hook ("keep each domain's most central pages").
    """
    order = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))
    )
    if order_col is not None:
        # centrality-weighted cap (graph -> selection loop): keep the
        # HIGHEST-valued rows per group (e.g. pagerank/trust from the
        # webgraph tables) instead of a hash-random subset; the keyed
        # hash stays as the deterministic tie-break.  Same single
        # row_number window — WindowGroupLimit pushes the cap map-side
        # either way.
        w = Window.partitionBy(group_col).orderBy(
            F.col(order_col).desc_nulls_last(), order.asc(), F.col(key_col).asc()
        )
    else:
        w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(cap))
        .drop("__rk")
    )


def score_quantile_buckets(
    df: DataFrame,
    score_col: str,
    by_col: str | None = None,
    k: int = 3,
    quantize: float | None = None,
) -> DataFrame:
    """Assign each row a quantile bucket 1..``k`` of ``score_col``
    within its ``by_col`` group — the CCNet head/middle/tail recipe
    (Wenzek et al. 2020: split each language's documents into
    perplexity terciles and keep the reference-like ones), generalized
    to any score and ``k``.  Returns the input columns plus ``bucket``
    (INT, 1 = best/lowest score); rows with a NULL score get a NULL
    bucket (unscorable — the caller decides their fate, symmetric with
    the LM gate's unscorable-docs-keep contract).

    Semantics are ``percentile_disc``-compatible and integer-exact:
    within a group of ``n`` scored rows, the row whose 1-based position
    (ordered by score ascending) is ``p`` lands in bucket
    ``floor((p-1)·k/n) + 1``, and TIED scores share the bucket of their
    FIRST position — so bucket boundaries never split a tie group, and
    the result is a pure function of the score multiset (no row-id
    tiebreak, no engine-dependent ordering).  A DuckDB audit of the
    identical construction matches bit-for-bit.

    Scale shape — the naive formulation (row_number window over every
    document, partitioned by language) funnels each language through
    one task; with 'en' at tens of TB that is THE skew hazard.  Instead
    the ranks are computed on the DISTINCT-score histogram: one
    (group, score) partial-agg shuffle, a cumulative-count window over
    the distinct scores only (micro-nat-rounded LM scores collapse
    heavily; pass ``quantize`` to bound the histogram hard — e.g.
    ``1e-3`` caps it at a few thousand rows per group for nat-scale
    scores, CCNet itself computes its cutoffs on quantized/sampled
    distributions), then one equi-join of the tiny bucket map back onto
    the corpus (AQE broadcasts it).  ``quantize`` rounds the score to
    that multiple for BOTH the histogram and the join key, so buckets
    remain exact for the quantized score.
    """
    if k < 2:
        raise ValueError(f"score_quantile_buckets: k must be >= 2, got {k}")
    by = [by_col] if by_col else []
    score = F.col(score_col)
    if quantize is not None:
        step = float(quantize)
        qscore = (F.round(score / F.lit(step), 0) * F.lit(step)).alias("__q")
    else:
        qscore = score.alias("__q")
    keyed = df.select(*df.columns, qscore)
    hist = keyed.filter(F.col("__q").isNotNull()).groupBy(*by, "__q").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_cum = (
        Window.partitionBy(*by)
        .orderBy("__q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*by)
    pos_first = F.sum("__c").over(w_cum) - F.col("__c") + F.lit(1)
    n = F.sum("__c").over(w_all)
    buckets = hist.select(
        *[F.col(c).alias(f"__b_{c}") for c in by],
        F.col("__q").alias("__b_q"),
        (F.floor((pos_first - 1) * F.lit(int(k)) / n) + 1)
        .cast("int")
        .alias("bucket"),
    )
    # the group key joins NULL-SAFELY: a NULL group value ("unknown
    # language") is a legitimate group — the histogram aggregates it as
    # one, and a plain equality join would silently hand every one of
    # its rows a NULL bucket.  The score key stays plain equality (the
    # histogram has no NULL scores, and NULL-score rows must NOT match).
    cond = F.col("__q") == F.col("__b_q")
    for c in by:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__b_{c}"))
    joined = keyed.join(buckets, cond, "left")
    return joined.drop("__q", "__b_q", *[f"__b_{c}" for c in by])
