"""Hybrid retrieval: BM25 (sparse) fused with feature-hash cosine
(dense) by Reciprocal Rank Fusion — the production search shape (lexical
recall catches exact terms, the embedding catches paraphrase; RRF fuses
the two WITHOUT score calibration, which is why it is the default fusion
everywhere from Elasticsearch to vector DBs).

Scale shape: each ranker reduces the corpus to an ``n_cand``-row
candidate list first (BM25 = two partial-agg shuffles + TakeOrdered,
dense = map-side fold against a literal query vector + TakeOrdered), so
the rank windows and the fusion join run on O(n_cand) rows — the global
``Window.orderBy`` here is NOT a scale smell, it orders a frame already
cut to the candidate budget.

Engine-exactness: BM25 scores are already quantized scaled-BIGINT sums
(text.bm25_topk); the dense cosine is a FIXED left-to-right multiply-add
chain over exact integer component sums (identical double arithmetic in
any engine that writes the same chain), rounded to 6 decimals; RRF's
``1/(k + rank)`` terms are IEEE-identical given identical integer ranks
— so the DuckDB oracle replays the whole fusion bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .embed import feature_hash_components
from .text import bm25_topk


def query_feature_hash_vector(terms: list[str], dim: int = 16) -> list[float]:
    """Embed a QUERY with the exact formula :func:`..operators.embed.
    feature_hash_embed` applies to documents (md5 bucket + md5 sign,
    unit L2), computed driver-side so the plan carries the query as a
    literal — no join, no second corpus pass."""
    s = [0] * dim
    for w in terms:
        h = hashlib.md5(w.encode()).hexdigest()
        b = int(h[:8], 16) % dim
        sg = 1 if int(h[8:9], 16) % 2 == 0 else -1
        s[b] += sg
    nrm = sum(v * v for v in s) ** 0.5
    return [v / nrm if nrm > 0 else 0.0 for v in s]


def dense_topk_feature_hash(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """Dense half: cosine of each document's feature-hash embedding
    against the query's — computed as dot(s, qv)/|s| on the raw integer
    component sums (qv is unit, so the document vector never needs unit
    normalizing), then TakeOrdered top-k."""
    # Flat component columns, not array folds: higher-order lambdas
    # (zip_with/aggregate) run INTERPRETED per element, which tripled
    # this ranker's cost; the fixed multiply-add chain over s_0..s_{d-1}
    # stays inside whole-stage codegen (measured 3.1 s -> ~1 s at
    # sf0.1). cos = dot(s, qv)/|s| directly on the integer sums — the
    # unit-normalized document vector never needs materializing, since
    # qv is already unit.  The fixed left-to-right chain order makes the
    # double arithmetic engine-identical (the oracle writes the same
    # textual chain).
    comp = feature_hash_components(
        df, dim=dim, text_col=text_col, id_col=id_col, tokens_df=tokens_df
    )
    qv = query_feature_hash_vector(query_terms, dim)
    dot = None
    sq = None
    for i in range(dim):
        term = F.col(f"s_{i}") * F.lit(float(qv[i]))
        dot = term if dot is None else dot + term
        t2 = F.col(f"s_{i}") * F.col(f"s_{i}")
        sq = t2 if sq is None else sq + t2
    nrm = F.sqrt(sq.cast("double"))
    cos = F.when(nrm > 0, F.round(dot / nrm, 6)).otherwise(F.lit(0.0))
    return (
        comp.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def hybrid_topk_rrf(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    n_cand: int = 50,
    k_rrf: int = 60,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "word",
) -> DataFrame:
    """Top-``k`` documents by RRF over the BM25 and dense candidate
    lists: ``score = Σ_rankers 1 / (k_rrf + rank)``, a ranker
    contributing nothing for documents outside its top-``n_cand``.
    Returns (id, rrf_score, r_lex, r_dense) with null ranks for
    single-list hits."""
    from .text import script_tokens, spread, tokens, validate_tokenizer

    validate_tokenizer(tokenizer)
    # ONE corpus tokenize for BOTH rankers: the exploded postings frame
    # is the dominant input of each (at 100 TB, one scan instead of two);
    # 'auto' indexes unsegmented-script docs as char bigrams.  spread
    # first (guide-§2.5): a one-split corpus scan otherwise serializes
    # the tokenize AND every aggregation reading the checkpointed
    # postings on a single task (no-op at scale).
    tok_arr = script_tokens(text_col) if tokenizer == "auto" else tokens(text_col)
    tok = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.explode(tok_arr).alias("w"))
        .localCheckpoint()
    )
    lex = bm25_topk(
        df, query_terms, k=n_cand, text_col=text_col, id_col=id_col, tokens_df=tok
    )
    # candidate frames are <= n_cand rows: the unpartitioned rank windows
    # below are deliberate and bounded (see module docstring)
    w_lex = Window.orderBy(F.desc("score"), F.col(id_col))
    lex_r = lex.select(id_col, F.row_number().over(w_lex).alias("r_lex"))
    dense = dense_topk_feature_hash(
        df, query_terms, k=n_cand, dim=dim, text_col=text_col, id_col=id_col,
        tokens_df=tok,
    )
    w_dense = Window.orderBy(F.desc("cos"), F.col(id_col))
    dense_r = dense.select(id_col, F.row_number().over(w_dense).alias("r_dense"))
    fused = lex_r.join(dense_r, id_col, "full_outer")
    score = F.coalesce(1.0 / (F.lit(k_rrf) + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(k_rrf) + F.col("r_dense")), F.lit(0.0)
    )
    return (
        fused.select(
            id_col,
            F.round(score, 6).alias("rrf_score"),
            "r_lex",
            "r_dense",
        )
        .orderBy(F.desc("rrf_score"), F.col(id_col))
        .limit(k)
    )
