"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding.

The tokenizer-training step of every LLM data pipeline, split along the
line that actually scales:

- **Counting is the corpus-scale pass** (proportional to the 100 TB
  input) and runs fully distributed: one map-side pre-tokenize +
  explode, one partial-aggregated shuffle on the word key
  (:func:`word_counts`). This is the only part that ever touches the
  full corpus.
- **Merging is vocab-scale** (proportional to the number of DISTINCT
  words, which plateaus by Heaps' law) and runs exact, deterministic
  BPE over the aggregated counts (:func:`train_bpe`). The driver pull
  is bounded by ``max_words`` — the long tail of hapax words
  contributes at most 1 count per pair and cannot change early merge
  decisions in any realistic corpus; the cap is the same move every
  production tokenizer trainer makes (HF ``tokenizers`` caps via
  min_frequency for the same reason).
- **Encoding is map-side again** (:func:`encode_bpe`): the learned
  merge ranks broadcast to executors, applied per pre-token inside an
  Arrow-batched Pandas UDF with a per-batch word cache (Zipf makes the
  cache hit rate extreme: encoding cost ~ distinct words per batch,
  not total words).

Merge-order determinism: ties on pair count break on the pair's
lexicographic order, so the learned vocabulary is reproducible across
runs, partitionings, and cluster sizes — required for any pipeline
that stamps a tokenizer hash into its manifests.

No counterpart in the reference (market-data) pipeline; this belongs
to the beyond-reference LLM-training-data family (SURVEY §6 scope).
Verified by ``tests/test_bpe.py``: hand-computed merge sequences,
losslessness (concatenated tokens == pre-tokens), monotone compression
in the merge count, and Spark-vs-pure-Python parity on the encode path.
"""

from __future__ import annotations

import contextlib
import re
from collections import Counter
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import BPE_TOKEN_RE

#: Python-side compilation of the same pre-tokenizer regex the JVM
#: expressions use (text.py BPE_TOKEN_RE) — one vocabulary boundary
#: definition shared by both engines.
_PRE_TOKEN_RE = re.compile(BPE_TOKEN_RE)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct pre-token frequencies — the distributed corpus pass.

    Map-side ``regexp_extract_all`` + explode, then one shuffle with
    partial aggregation on the word key. Output is ``(word, n)``,
    vocab-scale (distinct words), however large the corpus is.
    """
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    wc: DataFrame,
    n_merges: int,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a ``(word, n)`` count table.

    Pulls at most ``max_words`` rows (highest count first, word as the
    deterministic tie-break) — the driver-side state is bounded and
    vocab-scale, never corpus-scale. The merge loop is the classic
    exact algorithm: count adjacent symbol pairs weighted by word
    frequency, merge the argmax, repeat; ties break lexicographically
    on the pair so the result is reproducible.
    """
    rows = (
        wc.orderBy(F.desc("n"), F.col("word"))
        .limit(max_words)
        .collect()
    )
    counts: list[tuple[list[str], int]] = [(list(r["word"]), int(r["n"])) for r in rows]

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for syms, n in counts:
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        # max count, then lexicographically smallest pair — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        counts = [(_merge_word(syms, best), n) for syms, n in counts]
    return merges


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Replace every non-overlapping left-to-right occurrence of pair."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word, lowest rank first (exact BPE)."""
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not ranked:
            break
        syms = _merge_word(syms, min(ranked)[1])
    return syms


def encode_bpe(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a trained merge list — map-side.

    Broadcasts the rank table, then encodes inside an Arrow-batched
    ``mapInPandas`` with a per-batch distinct-word cache (Zipf: cache
    hits dominate, so per-batch cost tracks distinct words). Emits
    ``(id_col, tokens array<string>, n_tokens)``; no shuffle at all.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    brc = df.sparkSession.sparkContext.broadcast(ranks)
    out_schema = f"{id_col} string, tokens array<string>, n_tokens long"
    id_type = dict(df.dtypes)[id_col]
    if id_type in {"bigint", "int", "long"}:
        out_schema = f"{id_col} long, tokens array<string>, n_tokens long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = brc.value
        cache: dict[str, list[str]] = {}

        def enc_text(text: str) -> list[str]:
            toks: list[str] = []
            for w in _PRE_TOKEN_RE.findall(text or ""):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, r)
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc_text)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(len).astype("int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def bpe_packed_batches(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    shard_span: int = 4096,
) -> DataFrame:
    """Tokenizer-true training batches: encode with the trained BPE
    vocabulary, then pack the REAL token counts into fixed-capacity
    bins (``text.sequence_packing``'s two-level prefix sum).

    Packing against whitespace counts over-fills bins whenever BPE
    splits rare words into multiple tokens — the bins would overflow at
    training time. Composing the map-side encoder with the shard-safe
    packer keeps both scale shapes: no new shuffle beyond the packer's
    own, and the token arrays ride along for the final shard writer.

    Returns (id, group, tokens, n_tokens, tok_offset, bin_id,
    pos_in_bin).

    ``id_col`` must be numeric: the shard-safe packer derives shards as
    ``floor(id / shard_span)`` (a string id would cast to NULL shards
    and silently collapse the prefix sum) — enforced below.  The encoded
    intermediate stays persisted for the lifetime of the returned
    DataFrame (it backs two branches of the plan).  Long-lived sessions
    composing many packs should use :func:`bpe_packed_batches_scoped`,
    which unpersists that intermediate deterministically on exit; this
    plain call leaves it to session end (executor-memory-and-disk,
    never driver-resident).
    """
    packed, _enc = _packed_with_encoding(
        df, merges, capacity, text_col, id_col, group_col, shard_span
    )
    return packed


@contextlib.contextmanager
def bpe_packed_batches_scoped(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    capacity: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    shard_span: int = 4096,
):
    """Scoped variant of :func:`bpe_packed_batches`: a context manager
    that yields the packed DataFrame and UNPERSISTS the encoded
    intermediate on exit — the explicit resource handle for long-lived
    sessions composing many packs, where session-lifetime persists
    would otherwise accumulate in executor storage.  Consume (write /
    collect) the yielded frame INSIDE the block; after exit its plan
    re-tokenizes on any further action."""
    packed, enc = _packed_with_encoding(
        df, merges, capacity, text_col, id_col, group_col, shard_span
    )
    try:
        yield packed
    finally:
        enc.unpersist()


def _packed_with_encoding(
    df: DataFrame,
    merges: Iterable[tuple[str, str]],
    capacity: int,
    text_col: str,
    id_col: str,
    group_col: str,
    shard_span: int,
) -> tuple[DataFrame, DataFrame]:
    from pyspark.sql.types import NumericType

    from .text import sequence_packing

    id_field = df.schema[id_col]
    if not isinstance(id_field.dataType, NumericType):
        raise TypeError(
            f"bpe_packed_batches requires a numeric {id_col!r} (shard = "
            f"floor(id/shard_span)); got {id_field.dataType.simpleString()}. "
            "Derive a numeric id first, e.g. xxhash64(doc_id)."
        )

    # Multi-consumer frame: the packer's prefix-sum branches and the
    # final tokens join would each re-run the Arrow encode stage
    # (Spark has no cross-branch CSE) — persist the encoded output so
    # the corpus is tokenized exactly once.
    enc = encode_bpe(df, merges, text_col=text_col, id_col=id_col).persist()
    with_meta = df.select(id_col, group_col).join(enc, id_col)
    packed = sequence_packing(
        with_meta,
        text_col=text_col,
        id_col=id_col,
        group_col=group_col,
        capacity=capacity,
        shard_span=shard_span,
        count_col="n_tokens",
    )
    return packed.join(enc.select(id_col, "tokens"), id_col), enc
