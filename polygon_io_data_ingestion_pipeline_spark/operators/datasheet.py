"""Corpus datasheet — the one-call dataset report card.

"Datasheets for Datasets" (Gebru et al.) made per-release corpus
statistics a publishing norm; every training-data pipeline ends with
one. This composes the repo's per-document operators into a single
long-format ``(metric, value)`` frame a release process can print,
diff (``snapshot_diff`` on metric), or gate on:

- volume:   n_docs, token totals/means, short-doc share
- language: per-language share from the REAL language ID —
  Unicode-script counting with the function-word frequency classifier
  for Latin-dominant text (``predicted_lang_script``)
- quality:  quality-gate pass rate plus per-rule failure attribution
- dedup:    exact-duplicate rate (1 - distinct fingerprints / docs)

Scale shape: ONE persisted per-document pass (quality gate fused with
the stats expressions, all JVM map-side) feeds every aggregate; the
rollups are tiny partial-agg reductions over that cached frame, and
the output is O(metrics + languages) rows. No Python UDFs.

Composition of oracle-verified pieces (`docs_token_stats`,
`docs_script_langid`/`docs_latin_langid`, `docs_quality_filter`,
`dedup_exact_hash_classes` all hold DuckDB parity); the composition
itself is pytest-verified in ``tests/test_datasheet.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, predicted_lang_script, quality_filter

#: quality_filter audit flags rolled into failure-rate metrics.
_RULES = ("ok_length", "ok_word_len", "ok_stopwords", "ok_repetition")


def corpus_datasheet(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Long-format corpus report: ``(metric string, value double)``.

    Values are rounded to 6 decimals; shares are fractions of n_docs.
    """
    per_doc = quality_filter(df, text_col=text_col, id_col=id_col).join(
        df.select(
            F.col(id_col),
            predicted_lang_script(text_col).alias("__lang"),
            fingerprint(text_col).alias("__fp"),
        ),
        id_col,
    )
    per_doc = per_doc.persist()

    n_docs = F.count(F.lit(1))
    core = per_doc.agg(
        n_docs.alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.round(F.avg("n_tokens"), 6).alias("avg_doc_tokens"),
        F.round(F.avg((F.col("n_tokens") < 30).cast("double")), 6).alias(
            "short_doc_share"
        ),
        F.round(F.avg(F.col("keep").cast("double")), 6).alias("quality_pass_rate"),
        *[
            F.round(F.avg((~F.col(r)).cast("double")), 6).alias(f"fail_rate:{r}")
            for r in _RULES
        ],
        F.round(1 - F.countDistinct("__fp") / n_docs, 6).alias("exact_dup_rate"),
    )
    core_long = core.selectExpr(
        "stack("
        + str(6 + len(_RULES))
        + ", "
        + ", ".join(
            f"'{c}', CAST(`{c}` AS DOUBLE)"
            for c in core.columns
        )
        + ") AS (metric, value)"
    )
    lang_long = (
        per_doc.groupBy("__lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(per_doc.agg(n_docs.alias("n"))))
        .select(
            F.concat(F.lit("lang_share:"), F.col("__lang")).alias("metric"),
            F.round(F.col("c") / F.col("n"), 6).alias("value"),
        )
    )
    return core_long.unionByName(lang_long)
