"""Feature-hash text embedder — the text -> vector bridge to the ANN
family (hashing trick / HashingTF construction).

Each token is hashed to one of ``dim`` buckets with a +/-1 sign from an
independent hash bit (the signed hashing trick keeps collision noise
zero-mean); a document's vector is the per-bucket signed token count,
L2-normalized. Deterministic, vocabulary-free, and engine-portable —
the same md5-derived construction as the sampling/LSH families, so a
SQL engine reproduces every component bit-for-bit (components are
exact integer counts; unit-normalization is one IEEE sqrt + division).

Scale shape: the explode is map-side; the aggregation is ONE
partial-agg shuffle on ``doc_id`` with ``dim`` conditional-sum columns
(the PSI-bucket pattern) — NOT a (doc, bucket) keyed shuffle followed
by a re-gather, and not a Python UDF. Normalization and array assembly
are map-side expressions on the aggregated row.

The output feeds the similarity operators directly (same
``array<double>`` shape as the embeddings table after cast), closing
the loop: corpus -> hash embed -> IVF/PQ index -> ANN dedup/search
with no external model dependency.

Verified: ``docs_feature_hash_embed`` (full SQL oracle over the
exploded components) + ``tests/test_embed.py`` (unit norm,
determinism, sign balance, cosine-pipeline integration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _hash64(col_sql: str, start: int, n: int) -> str:
    """SQL for an int from md5 hex chars [start, start+n) of col_sql."""
    return f"CAST(conv(substr(md5({col_sql}), {start}, {n}), 16, 10) AS BIGINT)"


def feature_hash_components(
    df: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_df: DataFrame | None = None,
    tokenizer: str = "word",
) -> DataFrame:
    """Per-document signed-count components, pre-normalization.

    Returns (id, s_0 .. s_{dim-1}) — exact BIGINT bucket sums from ONE
    partial-aggregated shuffle on the document key. ``tokens_df``: a
    caller-shared (id, w) postings frame, so pipelines that already
    exploded the corpus (hybrid search) skip the second scan.

    ``tokenizer='auto'`` embeds unsegmented-script docs by their char
    bigrams — a whole spaceless CJK sentence is otherwise ONE token =
    one hash bucket, and the "embedding" degenerates to a single-axis
    unit vector (semantic dedup / ANN over such vectors is noise)."""
    from .text import script_tokens, validate_tokenizer

    validate_tokenizer(tokenizer)
    if tokens_df is not None:
        if tokenizer != "word":
            # a caller-shared postings frame IS the tokenization — a
            # non-default tokenizer alongside it would be silently
            # ignored (round-12 review finding); tokenize upstream
            raise ValueError(
                "feature_hash_components: pass EITHER tokens_df or a "
                "non-default tokenizer, not both"
            )
        tok = tokens_df
    else:
        tok_arr = (
            script_tokens(text_col) if tokenizer == "auto" else tokens(text_col)
        )
        tok = df.select(F.col(id_col), F.explode(tok_arr).alias("w"))
    bucket = F.expr(_hash64("w", 1, 8) + f" % {dim}")
    sign = F.expr(f"CASE WHEN {_hash64('w', 9, 1)} % 2 = 0 THEN 1 ELSE -1 END")
    hashed = tok.select(id_col, bucket.alias("b"), sign.alias("sg"))
    aggs = [
        F.sum(F.when(F.col("b") == i, F.col("sg")).otherwise(F.lit(0))).alias(f"s_{i}")
        for i in range(dim)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def feature_hash_embed(
    df: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "word",
) -> DataFrame:
    """(id, embedding array<double>) — unit-L2 signed-hash vectors.

    All-zero vectors (every bucket cancelled) stay all-zero rather than
    dividing by zero.
    """
    comp = feature_hash_components(df, dim, text_col, id_col, tokenizer=tokenizer)
    sq = " + ".join(f"s_{i} * s_{i}" for i in range(dim))
    norm = F.expr(f"sqrt(CAST({sq} AS DOUBLE))")
    arr = F.array(*[F.col(f"s_{i}").cast("double") for i in range(dim)])
    unit = F.when(
        norm > 0, F.expr("transform(emb_raw, x -> x / emb_norm)")
    ).otherwise(F.col("emb_raw"))
    return (
        comp.withColumn("emb_raw", arr)
        .withColumn("emb_norm", norm)
        .select(F.col(id_col), unit.alias("embedding"))
    )
