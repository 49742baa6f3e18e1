"""Entropy / compressibility quality signals for corpus filtering.

Two of the cheapest, most discriminating document-quality features in
LLM data pipelines (low character entropy = boilerplate, padding,
keyword stuffing; extreme compression ratios = template spam or binary
junk leaked into text):

- ``char_entropy`` — Shannon entropy (bits/char) of the document's
  character distribution.
- ``compression_ratio`` — deflate(level 6) bytes / utf-8 bytes, the
  classic "does it gzip away" spam signal.

Scale shape: ONE Arrow-batched ``mapInPandas`` pass, map-only, no
shuffle — per-document cost is O(len), so the stage is embarrassingly
parallel at 100 TB. The naive relational alternative (explode every
character, shuffle on (doc, char)) would shuffle a row PER CHARACTER
of the corpus; the batch kernel keeps all of that inside one Python
worker per partition.

Engine-portability (entropy): each per-character probability term is
quantized to a 1e-6 integer with ``floor(x + 0.5)`` (identical
semantics in Python and SQL, unlike round-half-even vs half-away) and
integer-summed, then divided by 1e6 as the final double — so a DuckDB
audit over an explicit character explode reproduces the value
bit-for-bit (unigram_logprob discipline; the oracle lives on
``docs_entropy_signals``). ``compression_ratio`` is not
SQL-expressible (zlib); it is pytest-verified against direct zlib.
"""

from __future__ import annotations

import math
import zlib
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def entropy_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (n_chars, char_entropy, compression_ratio).

    Null text propagates nulls; empty text is (0, 0.0, null).
    """
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, n_chars long, char_entropy double, compression_ratio double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_chars, ents, ratios = [], [], []
            for text in pdf[text_col]:
                if text is None:
                    n_chars.append(None)
                    ents.append(None)
                    ratios.append(None)
                    continue
                n = len(text)
                n_chars.append(n)
                if n == 0:
                    ents.append(0.0)
                    ratios.append(None)
                    continue
                total = 0
                for c in Counter(text).values():
                    p = c / n
                    total += math.floor(p * math.log2(p) * 1e6 + 0.5)
                ents.append(-total / 1e6)
                raw = text.encode("utf-8")
                ratios.append(len(zlib.compress(raw, 6)) / len(raw))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].reset_index(drop=True),
                    "n_chars": pd.array(n_chars, dtype="Int64"),
                    "char_entropy": pd.array(ents, dtype="float64"),
                    "compression_ratio": pd.array(ratios, dtype="float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
