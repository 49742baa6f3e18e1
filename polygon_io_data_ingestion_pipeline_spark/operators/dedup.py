"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the point of each design):

- **exact**: one shuffle on the md5 fingerprint — the canonical 100 TB
  dedup pattern (hash-groupBy, never a self-join on raw text).
- **jaccard_pairs**: shingle inverted-index self-join. Cost is bounded
  by sum over shingles of (docs-per-shingle)^2, not |docs|^2; hot
  shingles can be dropped like stopwords via ``max_docs_per_shingle``.
- **MinHash+LSH**: fixed-width signatures (k small) then banding, so
  candidate generation is a hash join on band keys — linear shuffle
  volume in |docs|, independent of pair count. Hash functions are
  ``md5(shingle + '#' + seed)`` string-mins: engine-portable and
  deterministic (the same construction is expressible in the DuckDB
  oracle, unlike engine-native hash()).
- **SimHash**: 32-bit signature from the high bit of each md5 hex digit
  of every token, token-count weighted; near-dups = small Hamming
  distance on a single long column.
- **embedding pairs**: brute-force cosine is quadratic — correct as an
  oracle/baseline; the LSH route (similarity.py) is the scale path.

Everything is built-in column expressions; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import (
    char_ngrams,
    dedup_normalized,
    fingerprint,
    script_run_shingles,
    script_shingles,
    script_tokens,
    spread,
    unicode_normalized,
    unsegmented_dominant,
    validate_tokenizer as _validate_tokenizer,
    word_shingles,
)


def _normalized_src(
    df: DataFrame, text_col: str, normalize_form: str | None
) -> DataFrame:
    """Optionally Unicode-normalize the text column before any
    fingerprint/shingle math (round-13 verdict ask #2): NFC vs NFD
    variants of identical rendered text (decomposed Hangul, accented
    Latin — macOS-originated crawl content ships NFD) otherwise hash
    and shingle differently, silently splitting duplicate classes
    along normalization-form lines.  ``None`` (default) is a no-op —
    zero plan change for every existing caller."""
    if normalize_form is None:
        return df
    return df.withColumn(
        text_col, unicode_normalized(text_col, normalize_form)
    )


def exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalized: bool = False,
    normalize_form: str | None = None,
) -> DataFrame:
    """Duplicate classes by exact (case-folded) content hash.
    ``normalized=True`` keys on the aggressive
    :func:`..text.dedup_normalized` form instead (punctuation folded,
    digit runs bucketed) — pages differing only cosmetically collapse
    into one class, the published near-exact web-dedup recipe.
    Documents whose normalized form is EMPTY (emoji-only, ASCII-art,
    punctuation-only — no letters or digits anywhere) fall back to the
    strict fingerprint: they are not cosmetic variants of each other,
    and one shared empty key would silently collapse them all
    corpus-wide.

    ``normalize_form='NFC'`` first Unicode-normalizes the text
    (:func:`_normalized_src`), so NFC/NFD variants of the same
    rendered page land in ONE class; composes with ``normalized=``."""
    df = _normalized_src(df, text_col, normalize_form)
    if normalized:
        norm = dedup_normalized(text_col)
        key = F.when(F.length(norm) > 0, F.md5(norm)).otherwise(
            fingerprint(text_col)
        )
    else:
        key = fingerprint(text_col)
    return (
        df.select(key.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize_form: str | None = None,
    fp_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Novelty filter for a continuously-growing corpus: keep only the
    documents of an incoming shard (a day's crawl) that are new BOTH
    against the historical corpus and within the shard itself.

    ``seen_fingerprints`` is the running ``(fp)`` table persisted in the
    lake (append the returned delta after each shard); ``None`` means a
    cold start. Returns ``(novel_docs, new_fingerprint_delta)`` — the
    delta contains each novel fingerprint exactly once, so appending it
    keeps the history exact with no rewrite of the existing table.

    Scale shape: within-shard dedup is one keyed min-agg join on the
    fingerprint (keep the min-``id_col`` representative —
    deterministic, not "whichever partition won"); the history check is
    a LEFT ANTI join on the fingerprint key. Both are plain hash
    equi-joins on md5 keys — uniformly distributed, skew-free; the
    history side streams from the lake, never through the driver. The
    fingerprint table is the ONLY state that grows with corpus history,
    and it is O(distinct docs) narrow rows.

    ``normalize_form`` / ``fp_col`` (round 13): like the near-dup
    tokenizer, the normalization form must stay CONSTANT for the
    lifetime of a fingerprint history — entries computed under
    different forms never match, and flipping the form mid-history
    silently re-admits every NFD/NFC duplicate of historical docs.
    ``fp_col`` names a PRE-COMPUTED fingerprint column on ``new_docs``
    (the crawl/corpus lanes already carry one derived with the lake's
    form) — reusing it avoids a second normalization pass over the
    batch text and keeps exactly ONE fp derivation per lake.
    """
    if fp_col is not None:
        if normalize_form is not None:
            raise ValueError(
                "fp_col names an already-derived fingerprint; apply "
                "normalize_form where that column is computed instead"
            )
        fp = new_docs.select(F.col(id_col), F.col(fp_col).alias("fp"))
    else:
        fp = _normalized_src(
            new_docs.select(F.col(id_col), F.col(text_col)), text_col, normalize_form
        ).select(F.col(id_col), fingerprint(text_col).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    if seen_fingerprints is not None:
        keep = keep.join(
            seen_fingerprints.select("fp"), "fp", "left_anti"
        )
    novel = new_docs.join(keep.select(id_col), id_col, "left_semi")
    return novel, keep.select("fp")


#: Default stop-shingle document-frequency cutoff. A shingle shared by
#: df documents contributes df^2 intersect rows in the direct strategy;
#: capping df bounds any single key's blowup at ~10^6 rows (AQE splits
#: the rest) while a boilerplate shingle on a real web corpus (df in
#: the millions) would otherwise dominate the whole job. Lossy ONLY for
#: pairs whose overlap consists of ultra-hot shingles — boilerplate by
#: definition — and far above any fixture df (sf0.1 max is ~25), so
#: oracle parity is unaffected. Pass ``None`` for the exact operator.
DEFAULT_MAX_DOCS_PER_SHINGLE = 1000


def _spread(df: DataFrame) -> DataFrame:
    """Rebalance raw documents across the cluster before a row-amplifying
    map (shingle/token explode + per-shingle hashing) — the shared
    :func:`..text.spread` (promoted there so the NB/LM/BM25
    folds apply the same discipline). No-op when the scan already has
    enough splits (the 100 TB case)."""
    return spread(df)


def shingle_set(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    tokenizer: str = "word",
    char_n: int = 5,
    normalize_form: str | None = None,
) -> DataFrame:
    """Distinct (id, shingle) pairs — the inverted-index input.

    Shingle dedup is *per document*, so it happens map-side with
    ``array_distinct`` before the explode — no global distinct shuffle
    (the naive ``explode().distinct()`` shuffles the full posting list
    once just to dedup rows that were never duplicated across keys).

    ``tokenizer='auto'`` (round 12) routes unsegmented-script-dominant
    docs (Han/kana/Thai — no spaces, so a whole sentence is ONE word
    shingle and near-dup detection degrades to near-exact-only)
    through character ``char_n``-grams instead
    (:func:`..text.script_shingles`); spaced docs keep the word
    shingles bit-for-bit.  ``tokenizer='runs'`` (round 13) shingles
    over per-script-RUN tokens instead (:func:`..text
    .script_run_shingles`) — an embedded CJK paragraph below the 30%
    dominance line is char-grammed in place rather than being one
    opaque token.  ``normalize_form='NFC'`` Unicode-normalizes the
    text first (all lanes shingle the SAME canonical form)."""
    _validate_tokenizer(tokenizer, allowed=("word", "auto", "runs"))
    df = _normalized_src(df, text_col, normalize_form)
    sh = (
        script_shingles(text_col, n, char_n)
        if tokenizer == "auto"
        else script_run_shingles(text_col, n, char_n)
        if tokenizer == "runs"
        else word_shingles(text_col, n)
    )
    return _spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(sh)).alias("shingle"),
    )


def _intersect_candidates(
    cand: DataFrame, sh: DataFrame, id_col: str
) -> DataFrame:
    """(id1, id2, inter) — exact shingle-intersection counts computed on
    candidate pairs ONLY (shared by jaccard_pairs' prefix strategy and
    lsh_verified_pairs)."""
    s1 = sh.select(F.col(id_col).alias("id1"), F.col("shingle").alias("s"))
    s2 = sh.select(F.col(id_col).alias("id2"), F.col("shingle").alias("s"))
    return (
        cand.join(s1, "id1")
        .join(s2, ["id2", "s"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("inter"))
    )


def _finalize_jaccard(
    inter: DataFrame, sizes: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Join per-doc shingle-set sizes onto intersection counts, compute
    jaccard, threshold, round — the one finalize every jaccard-pair
    path shares."""
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1")),
            "id1",
        )
        .join(
            sizes.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2")),
            "id2",
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
    max_docs_per_shingle: int | None = DEFAULT_MAX_DOCS_PER_SHINGLE,
    strategy: str = "auto",
    tokenizer: str = "word",
    char_n: int = 5,
    normalize_form: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-word-shingle Jaccard similarity (exact).

    Two exact physical strategies, picked by threshold when ``auto``:

    - ``direct`` (low thresholds): distributed self-join of the shingle
      postings on the shingle key, counting intersections in one
      aggregation. Work is sum(df^2) spread across shingle keys; hot
      keys are split by AQE skew-join handling (never a single-reducer
      posting list — there is no collect_list). Right when prefixes
      would be nearly the whole document (t < ~0.2, where AllPairs
      prefix length |d|-ceil(t|d|)+1 ~ |d|).
    - ``prefix`` (high thresholds): AllPairs/PPJoin prefix filtering.
      Shingles are ordered rarest-first (ascending document frequency);
      only each document's first |d|-ceil(t|d|)+1 shingles are indexed.
      Any pair with Jaccard >= t shares an indexed prefix shingle (the
      intersection is >= ceil(t|d|) on both sides while the unindexed
      suffix holds only ceil(t|d|)-1), so the candidate self-join is
      lossless; the exact intersection is then computed from the full
      shingle sets of candidates only. Stop-shingles sort last and drop
      out of every prefix — no hot posting list at all.

    ``max_docs_per_shingle`` drops ultra-hot shingles from the index as
    a stopword cutoff — safe-by-default on skewed corpora (default
    ``DEFAULT_MAX_DOCS_PER_SHINGLE``; lossy only for pairs overlapping
    solely in boilerplate shingles; ``None`` = exact).

    Returns ``(id1, id2, jaccard)`` with id1 < id2, jaccard >= threshold.
    """
    if strategy == "auto":
        strategy = "prefix" if threshold >= 0.2 else "direct"
    # The exploded postings feed 4 (direct) / 5 (prefix) consumers —
    # sizes, the df cap/ranking, and both join sides; Spark re-executes
    # lineage per consumer, so without truncation the shingle explode
    # runs that many times over the corpus. Materialize it once
    # (same fix as shared_substring_pairs / duplicated_ngram_fraction).
    sh = shingle_set(
        df, text_col, id_col, n, tokenizer, char_n, normalize_form
    ).localCheckpoint()
    # sizes feeds BOTH sides of the finalize join (n1, n2); lazily
    # materialize the doc-sized table so the posting pass behind it
    # runs once, not once per consumer (lazy = no job at plan build).
    sizes = (
        sh.groupBy(id_col)
        .agg(F.count("*").alias("n_sh"))
        .localCheckpoint(eager=False)
    )

    if strategy == "direct":
        sh_idx = sh
        if max_docs_per_shingle is not None:
            keep = (
                sh.groupBy("shingle")
                .agg(F.count("*").alias("df_"))
                .filter(F.col("df_") <= max_docs_per_shingle)
                .select("shingle")
            )
            sh_idx = sh.join(keep, "shingle", "left_semi")
        a = sh_idx.select(F.col(id_col).alias("id1"), F.col("shingle").alias("s"))
        b = sh_idx.select(F.col(id_col).alias("id2"), F.col("shingle").alias("s"))
        inter = (
            a.join(b, "s")
            .filter(F.col("id1") < F.col("id2"))
            .groupBy("id1", "id2")
            .agg(F.count("*").alias("inter"))
        )
    elif strategy == "prefix":
        from pyspark.sql import Window

        # AllPairs ranking, round-14 shape: (a) the per-doc size n_sh is
        # a count window on the SAME id exchange the rank window already
        # pays (was: a separate sizes aggregate + join-back — identical
        # values, every posting row matched its size row by
        # construction); (b) the surviving PREFIX rows (small: each doc
        # keeps |d|-ceil(t|d|)+1 shingles) are materialized ONCE —
        # without that the ENTIRE ranking lineage (both shuffles
        # included) re-executes for each side of the candidate
        # self-join (verified in the round-14 before-plan: two complete
        # Window+Exchange subtrees, no reuse).  The per-shingle df
        # DELIBERATELY stays a groupBy + join rather than a count
        # window on the shingle key: the aggregate partial-combines
        # map-side and its join gets AQE skew handling, while a window
        # partition on a hot shingle would serialize one task with no
        # skew split (guide §2.5 — AQE splits joins only).
        tok_df = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
        w_id = Window.partitionBy(id_col)
        ranked = (
            sh.join(tok_df, "shingle")
            .withColumn("n_sh", F.count(F.lit(1)).over(w_id))
            .withColumn(
                "rnk", F.row_number().over(w_id.orderBy("df_", "shingle"))
            )
            .filter(
                # fp-guard the ceil: IEEE noise can inflate t*n past the
                # exact integer (0.07*100 -> 7.000000000000001 -> ceil 8),
                # which would shorten the prefix below the lossless
                # AllPairs bound; the epsilon only ever lengthens it.
                F.col("rnk")
                <= F.col("n_sh")
                - F.ceil(F.lit(float(threshold)) * F.col("n_sh") - F.lit(1e-9))
                + 1
            )
        )
        if max_docs_per_shingle is not None:
            ranked = ranked.filter(F.col("df_") <= max_docs_per_shingle)
        prefix = ranked.select(id_col, "shingle").localCheckpoint()
        pa = prefix.select(F.col(id_col).alias("id1"), "shingle")
        pb = prefix.select(F.col(id_col).alias("id2"), "shingle")
        cand = (
            pa.join(pb, "shingle")
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
        )
        inter = _intersect_candidates(cand, sh, id_col)
    else:
        raise ValueError(f"strategy must be auto|direct|prefix, got {strategy!r}")

    return _finalize_jaccard(inter, sizes, id_col, threshold)


#: Mersenne prime 2^31 - 1: modulus of the universal-hash family below.
MINHASH_P = 2147483647

#: Fixed (a, b) mixing pairs; the j-th minhash uses h_j = (a*h + b) mod P.
#: a < 2^21 and h < P < 2^31 keep a*h + b < 2^52 — exact in int64 on any
#: engine (and reproducible in the DuckDB oracles).
MINHASH_MIX: list[tuple[int, int]] = [
    (1000003, 12345),
    (999983, 54321),
    (888887, 246810),
    (777767, 135791),
    (666671, 975310),
    (555557, 864209),
    (444443, 753198),
    (333331, 642087),
]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
    tokenizer: str = "word",
    char_n: int = 5,
    shingles_df: DataFrame | None = None,
    normalize_form: str | None = None,
) -> DataFrame:
    """k MinHash values per document. Output: (id, mh_0..mh_{k-1}).

    ``shingles_df``: a caller-shared (id, shingle) frame, so pipelines
    that also need the raw shingles (candidate VERIFICATION) shingle
    the corpus exactly once.

    One strong hash per distinct shingle (md5 -> int64), then k cheap
    universal-hash mixes ``(a_j*h + b_j) mod P`` — integer arithmetic
    instead of k string hashes per shingle, the standard formulation for
    corpus-scale minhash (hashing dominates the cost at 100 TB).

    Wide form: one aggregation with k min columns over the shingle set
    (no ×k row explosion); the only shuffle moves (id, int64) pairs —
    the string-side work (shingling, per-shingle md5) is map-only and
    happens exactly once. (A fully map-side array formulation was tried
    and is SLOWER: Catalyst collapses the projections and re-evaluates
    the shingle-hash array once per output column — k× the md5 work.)
    """
    if k > len(MINHASH_MIX):
        raise ValueError(f"k={k} exceeds the {len(MINHASH_MIX)} mixing pairs")
    if shingles_df is not None and normalize_form is not None:
        # a caller-shared shingle frame was built under ITS OWN
        # normalization decision — silently dropping the request here
        # would leave NFD/NFC dupes split while the caller believes
        # they are collapsed (round-13 review finding)
        raise ValueError(
            "pass normalize_form to the shingle_set that built "
            "shingles_df, not to minhash_signatures"
        )
    sh = (
        shingles_df
        if shingles_df is not None
        else shingle_set(df, text_col, id_col, n, tokenizer, char_n, normalize_form)
    )
    h = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
        % MINHASH_P
    )
    hs = sh.select(F.col(id_col), h.alias("h"))
    return hs.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh_{j}")
            for j, (a, b) in enumerate(MINHASH_MIX[:k])
        ]
    )


def _sig_band_keys(
    mh: DataFrame, id_col: str, k: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bkey) rows from a wide minhash-signature frame — band
    key is md5 of the band's minhashes joined in seed order. Map-side."""
    n_bands = k // rows_per_band
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh_{j}") for j in range(b * rows_per_band, (b + 1) * rows_per_band)],
                    )
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    return mh.select(F.col(id_col), F.explode(band_entries).alias("e")).select(
        id_col, F.col("e.band").alias("band"), F.col("e.bkey").alias("bkey")
    )


def _band_candidate_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """(id1, id2) candidates from a (id, band, bkey) frame: the band-key
    equi self-join shared by lsh_candidate_pairs, lsh_verified_pairs and
    the incremental near-dedup's within-shard stage — shuffle volume
    linear in the corpus, never quadratic."""
    a = bands.select(F.col(id_col).alias("id1"), "band", "bkey")
    b = bands.select(F.col(id_col).alias("id2"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
    rows_per_band: int = 2,
    tokenizer: str = "word",
    char_n: int = 5,
    normalize_form: str | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: documents sharing any full band.

    Band key = md5 of the band's minhashes in seed order; candidates are
    produced by a self-join on (band, key) — shuffle volume linear in
    the corpus, never quadratic.
    """
    mh = minhash_signatures(
        df, text_col, id_col, n, k, tokenizer, char_n,
        normalize_form=normalize_form,
    )
    bands = _sig_band_keys(mh, id_col, k, rows_per_band)
    # Both self-join sides consume the band table; without truncation
    # the full minhash lineage (shingle explode + per-shingle md5 + the
    # k-min aggregation) executes twice. The band table is tiny
    # (n_bands rows per document) — materialize it once.
    bands = bands.localCheckpoint()
    return _band_candidate_pairs(bands, id_col)


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n: int = 3,
    k: int = 8,
    rows_per_band: int = 2,
    tokenizer: str = "word",
    char_n: int = 5,
    normalize_form: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs at production scale: banded-LSH candidate
    generation (linear shuffle volume) followed by EXACT Jaccard
    verification computed on the candidates only — the published
    web-dedup recipe (LSH recalls, the verify removes band-collision
    false positives; recall is bounded by the banding, which is the
    accepted trade at corpus scale — :func:`jaccard_pairs` is the
    exhaustive alternative).

    Scale shape: the corpus shingles EXACTLY ONCE (one localCheckpointed
    (id, shingle) frame feeds the minhash aggregation, both sides of the
    intersection join, and the per-doc sizes); candidates come from the
    band-key equi-join; the intersection count touches candidate pairs
    only.  Returns ``(id1, id2, jaccard)`` with id1 < id2,
    jaccard >= threshold."""
    sh = shingle_set(
        df, text_col, id_col, n, tokenizer, char_n, normalize_form
    ).localCheckpoint()
    # doc-sized, two finalize consumers — materialize once, lazily
    sizes = (
        sh.groupBy(id_col)
        .agg(F.count("*").alias("n_sh"))
        .localCheckpoint(eager=False)
    )
    mh = minhash_signatures(df, text_col, id_col, n, k, shingles_df=sh)
    bands = _sig_band_keys(mh, id_col, k, rows_per_band).localCheckpoint()
    cand = _band_candidate_pairs(bands, id_col)
    return _finalize_jaccard(
        _intersect_candidates(cand, sh, id_col), sizes, id_col, threshold
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    tokenizer: str = "word",
    normalize_form: str | None = None,
) -> DataFrame:
    """Token-count-weighted SimHash signature (one long per document).

    Bit i of a token's hash is the high bit of hex digit i of its md5 —
    ``bits`` independent 1-bit hashes from one md5, identical in any
    engine with md5 (portable to the SQL oracle).

    ``tokenizer='auto'`` routes unsegmented-script-dominant docs through
    character bigram tokens (a spaceless CJK doc is otherwise ONE token
    = one md5 — every edit flips the whole signature).  Spaced docs
    keep the EXACT ``split(text, ' ')`` expression of the 'word' path
    (empty tokens included), so switching a fully-spaced corpus to
    'auto' is signature-identical — the same bit-compat contract
    :func:`..text.script_shingles` documents (round-13 ADVICE fix:
    the word branch previously went through script_tokens' filtered
    ``\\s+`` split, silently changing Latin-corpus signatures)."""
    _validate_tokenizer(tokenizer)
    df = _normalized_src(df, text_col, normalize_form)
    tok_arr = (
        F.when(
            # char bigrams, same as script_tokens' unsegmented branch
            unsegmented_dominant(text_col), char_ngrams(text_col, 2)
        ).otherwise(F.split(F.col(text_col), " "))
        if tokenizer == "auto"
        else F.split(F.col(text_col), " ")
    )
    toks = (
        _spread(df)
        .select(F.col(id_col), F.explode(tok_arr).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("h", F.md5(F.col("tok")))
    )
    contrib = (
        toks.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("i"),
            F.col("w"),
            F.col("h"),
        )
        .withColumn(
            "s",
            F.when(
                F.expr("substr(h, i + 1, 1)").isin(*list("89abcdef")), F.col("w")
            ).otherwise(-F.col("w")),
        )
        .groupBy(id_col, "i")
        .agg(F.sum("s").alias("s"))
    )
    return contrib.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(
                F.lit(0).cast("long")
            )
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, via the pigeonhole
    banded join.

    Split each signature into ``max_hamming + 1`` disjoint bit chunks:
    two signatures within Hamming distance ``max_hamming`` must agree
    **exactly** on at least one chunk, so candidate generation is a
    hash join on (chunk index, chunk value) — shuffle volume linear in
    the corpus, like MinHash-LSH banding — followed by an exact
    Hamming verification on candidates only. Returns exactly what the
    all-pairs formulation (:func:`simhash_pairs_allpairs`) returns,
    without its |docs|^2 cartesian.
    """
    sig = simhash(df, text_col, id_col, bits)
    return hamming_pairs(sig, "simhash", id_col=id_col, bits=bits, max_hamming=max_hamming)


def hamming_pairs(
    sig: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 6,
) -> DataFrame:
    """Pairs of ids whose integer hashes are within ``max_hamming`` bits,
    via the pigeonhole banded join — the generalized core of
    :func:`simhash_pairs`, reused by image perceptual-hash dedup
    (:mod:`..multimodal.phash`) and anything else carrying a precomputed
    fixed-width hash column.

    Split each hash into ``max_hamming + 1`` disjoint bit chunks: two
    hashes within the threshold must agree EXACTLY on at least one
    chunk, so candidates come from a (chunk index, chunk value) hash
    equi-join — shuffle linear in the corpus, never all-pairs — then an
    exact ``bit_count(xor)`` verification on candidates only.  64-bit
    hashes with the sign bit set are handled: chunking uses
    ``shiftrightunsigned``.  Returns ``(id1, id2, hamming)`` with
    ``id1 < id2``.
    """
    n_chunks = max_hamming + 1
    width = -(-bits // n_chunks)  # ceil: last chunk may be narrower
    # a full-width chunk (max_hamming=0 degenerates the banding to a
    # plain equality join) needs the signed all-ones literal: the
    # unsigned (1<<64)-1 overflows a LongType literal
    mask = -1 if width >= 64 else (1 << width) - 1

    def _ckey(c: int):
        # chunks that start AT or past the hash width are PHANTOM (the
        # ceil division over-covers: 9 chunks x 8 bits span 72 > 64) —
        # their key is constant 0, an always-matching chunk that keeps
        # the pigeonhole guarantee.  Computing them with a shift would
        # be WRONG, not just wasteful: the JVM masks shift counts mod
        # 64, so shiftrightunsigned(h, 64) silently equals h and the
        # phantom chunk duplicated chunk 0 — two hashes spreading their
        # <= max_hamming differences across every REAL chunk then
        # matched nowhere and the pair was LOST (caught by the
        # Hypothesis recall pin with correlated hashes).
        if c * width >= bits:
            return F.lit(0).cast("long")
        return (
            F.shiftrightunsigned(F.col(hash_col), c * width)
            .bitwiseAND(F.lit(mask))
        )

    chunk_entries = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), _ckey(c).alias("ckey"))
            for c in range(n_chunks)
        ]
    )
    entries = sig.select(
        F.col(id_col), F.col(hash_col).alias("__h"), F.explode(chunk_entries).alias("e")
    ).select(id_col, "__h", F.col("e.chunk").alias("chunk"), F.col("e.ckey").alias("ckey"))
    a = entries.select(F.col(id_col).alias("id1"), F.col("__h").alias("h1"), "chunk", "ckey")
    b = entries.select(F.col(id_col).alias("id2"), F.col("__h").alias("h2"), "chunk", "ckey")
    return (
        a.join(b, ["chunk", "ckey"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
        .distinct()
    )


def duplicate_clusters(
    pairs: DataFrame, all_ids: DataFrame | None = None, id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: connected components by
    iterative min-label propagation. Output ``(doc_id, cluster_id)``
    with ``cluster_id`` = the minimum member id of the component — the
    canonical-document convention (keep ``doc_id == cluster_id``, drop
    the rest).

    The step every dedup pipeline needs after pair generation: pairwise
    near-dups are not deduplicatable until transitively closed (A~B,
    B~C means A,B,C are one group even when A~C scored below
    threshold).

    Scale shape: each round is one hash join (labels onto the
    symmetrized edge list) + one min-aggregation — all keyed shuffles,
    no driver-side graph. Rounds needed = O(component diameter), and
    near-dup components are shallow (dup clusters are cliques-ish), so
    this converges in a handful of rounds; large-star/small-star is the
    constant-factor refinement for adversarial chain graphs. Two
    Spark-specific guards: the per-round ``localCheckpoint`` truncates
    the otherwise exponentially nesting iterative lineage, and
    convergence is detected by counting changed labels (one action per
    round, unavoidable in any driver-coordinated fixpoint).

    ``all_ids`` (e.g. ``docs.select("doc_id")``) adds documents that
    appear in no pair as singleton clusters of themselves.
    """
    # Materialize the PAIRS once BEFORE the symmetrizing union: both
    # union branches reference the frame and Spark has no cross-branch
    # CSE, so an expensive pair lineage (the LSH candidate join + exact
    # verify of lsh_verified_pairs) would otherwise execute twice just
    # to build the edge list (round-12 review finding).  The edge list
    # then checkpoints again for the propagation rounds below.
    pairs = pairs.select("id1", "id2").localCheckpoint(eager=True)
    edges = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    # Materialize the symmetrized edge list ONCE: it is consumed by
    # every propagation round — without this checkpoint each round
    # re-executes the union/distinct (measured: minutes instead of
    # seconds at sf0.1 when the pair lineage rode along).
    edges = (
        edges.union(pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("cluster_id", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("cluster_id").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("src", "node"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("cluster_id", "old"), "node"
            )
            .filter(F.col("cluster_id") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(F.col("node").alias(id_col), "cluster_id")
    if all_ids is not None:
        singles = all_ids.select(id_col).join(out.select(id_col), id_col, "left_anti")
        out = out.unionByName(singles.withColumn("cluster_id", F.col(id_col)))
    return out


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: per-document n-gram overlap with an
    evaluation/benchmark corpus — the standard check that training data
    does not contain test-set text (measured, like the common published
    recipes, as the fraction of a document's distinct n-gram shingles
    that also occur anywhere in the benchmark).

    Scale shape: the benchmark side (eval suites — thousands of docs,
    not billions) collapses to a DISTINCT shingle set and is
    broadcast, so the 100 TB training corpus is never shuffled for the
    probe: shingling is map-side, the membership join is a broadcast
    hash join, and the only keyed shuffle is the per-document count
    aggregation on ``id_col``. Returns
    (id, n_shingles, n_overlap, overlap_ratio, is_contaminated).
    """
    doc_sh = shingle_set(docs, text_col, id_col, n)
    bench_sh = shingle_set(benchmark, text_col, id_col, n).select("shingle").distinct()
    totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap").cast("double") / F.col("n_shingles")
    return (
        totals.join(hits, id_col, "left")
        .na.fill({"n_overlap": 0})
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            F.round(ratio, 6).alias("overlap_ratio"),
            (ratio >= threshold).cast("int").alias("is_contaminated"),
        )
    )


def shared_substring_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int | None = DEFAULT_MAX_DOCS_PER_SHINGLE,
) -> DataFrame:
    """Cross-document repeated-substring detection (MOSS-style): pairs
    of documents sharing >= ``min_shared`` winnowing fingerprints. The
    winnowing guarantee makes this a character-level near-match
    detector — any two documents sharing a run of ``k + w - 1``
    characters share at least one fingerprint — catching copied
    passages that word-shingle Jaccard dilutes away in long documents
    (the approximate form of the suffix-array exact-substring dedup
    used on large LM corpora, at a fraction of the cost).

    Scale shape mirrors :func:`jaccard_pairs` ``direct``: sketches are
    map-side (:func:`~..operators.text.winnow_sketch`), the pair count
    is one posting self-join on the fingerprint key (AQE splits hot
    keys), cost bounded by sum over fingerprints of df². The winnow
    sketch is ~1/w of the k-gram stream, so postings are w× smaller
    than a raw k-gram index. ``max_docs_per_fp`` drops boilerplate
    fingerprints shared by more documents than the cap — the stopword
    cutoff — making the index robust on skewed corpora.

    Returns (id1, id2, n_shared) with id1 < id2.
    """
    from .text import winnow_sketch

    fp = df.select(
        F.col(id_col), F.explode(winnow_sketch(text_col, k, w)).alias("fp")
    )
    # Three consumers below (the df-cap aggregate and both self-join
    # sides) and Spark has no cross-branch CSE: without truncation the
    # rolling-hash sketch recomputes once per consumer — the dominant
    # cost of the whole operator. localCheckpoint materializes the
    # exploded postings once (same discipline as duplicate_clusters).
    fp = fp.localCheckpoint()
    if max_docs_per_fp is not None:
        keep = (
            fp.groupBy("fp")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_docs_per_fp)
            .select("fp")
        )
        fp = fp.join(keep, "fp", "left_semi")
    a = fp.select(F.col(id_col).alias("id1"), "fp")
    b = fp.select(F.col(id_col).alias("id2"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def duplicated_ngram_fraction(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Cross-corpus duplicated n-gram fraction: for each document, the
    share of its distinct n-gram shingles that also occur in at least
    ``min_doc_freq - 1`` OTHER documents — the corpus-level repetition
    signal the published web-corpus recipes use alongside the
    within-document rules of :func:`~..operators.text.repetition_stats`
    (boilerplate, licence blocks and mirrored pages all surface as a
    high duplicated-n-gram share long before they are exact or
    near-duplicates).

    Unlike :func:`contamination_overlap`, the reference set here is the
    corpus itself, so nothing is broadcast: the document-frequency side
    is the full shingle posting table. Scale shape: per-document
    shingle dedup is map-side (``array_distinct`` before the explode),
    the DF count is one partial-agg shuffle on the shingle, the
    frequent-set membership is a keyed equi join on the same shingle
    key (AQE handles hot shingles), and the only other shuffle is the
    per-document count. The posting table is materialized ONCE and all
    three legs — DF count, membership join, per-document totals — read
    it; the totals are a ``count(*)`` per id over that single pass
    (``shingle_set`` is per-doc distinct, so this equals the map-side
    distinct-shingle count without a second corpus scan).

    Returns (id, n_shingles, n_dup, dup_ratio).
    """
    # THREE consumers derive from the exploded shingles (the DF
    # aggregate, the membership join side, and the per-doc totals); no
    # cross-branch CSE in Spark, so without truncation the shingle
    # explode runs once per consumer. localCheckpoint materializes the
    # postings once (same fix as shared_substring_pairs). The per-doc
    # totals aggregate the POSTING table (shingle_set is per-doc
    # distinct, so count(*) per id IS size(array_distinct(shingles)));
    # computing them as a separate scan of the raw documents instead
    # costs a second full corpus pass whose shingle transform — the
    # operator's dominant per-row cost, an interpreted higher-order
    # lambda — is additionally evaluated TWICE on that leg, because the
    # n_shingles > 0 filter pushes down into the scan as a duplicate of
    # the projection (measured in the sf0.1 plan: Filter(2)/Project(3)
    # both carry the whole transform).
    sh = shingle_set(docs, text_col, id_col, n).localCheckpoint()
    totals = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    frequent = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_doc_freq)
        .select("shingle")
    )
    dup = sh.join(frequent, "shingle").groupBy(id_col).agg(F.count("*").alias("n_dup"))
    ratio = F.col("n_dup").cast("double") / F.col("n_shingles")
    # No n_shingles > 0 filter needed: a doc reaches the posting table
    # only with >= 1 shingle, so the totals frame excludes empty docs
    # by construction (identical row set to the filtered scan form).
    return (
        totals.join(dup, id_col, "left")
        .na.fill({"n_dup": 0})
        .select(id_col, "n_shingles", "n_dup", F.round(ratio, 6).alias("dup_ratio"))
    )


def duplicated_line_removal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """CCNet/Dolma-style cross-document LINE dedup: rewrite each
    document with the lines that occur (whitespace-normalized exact
    match) in >= ``min_docs`` DISTINCT documents removed.  Boilerplate
    that survives per-page extraction — footers rendered as text,
    licence blocks, mirrored navigation — is invisible to per-document
    repetition rules precisely because its signal is repetition ACROSS
    documents; this is the published web-corpus recipes' paragraph-hash
    dedup, at line granularity.

    Lines shorter than ``min_chars`` (after trim) are never removed —
    raise it to protect short legitimate headings ("Introduction") at
    the cost of keeping short boilerplate.  Documents keep their row
    even when every line is removed (empty text; the quality gate
    downstream is the right place to drop them).

    Scale shape: all native expressions, four linear shuffles and no
    Python — posexplode the lines, ONE partial-agg count of distinct
    docs per normalized line key, a left-anti join back on the key
    (AQE handles hot boilerplate keys), an order-preserving rebuild
    (collect_list of (pos, line) structs + array_sort — bounded by a
    document's own line count), and the join back onto the input row.
    The frequent-line set is O(corpus lines), never broadcast, never
    collected.

    Returns ``docs`` with ``text_col`` rewritten.
    """
    norm = lambda c: F.regexp_replace(F.trim(c), r"\s+", " ")  # noqa: E731
    # Deliberately NOT spread and NOT checkpointed (all three variants
    # measured at sf0.1, 5 reps each, interleaved): plain 0.92-0.98s,
    # spread 1.53-1.58s (both consumers re-ran the explode 32-way
    # behind the extra exchange), spread+localCheckpoint 1.9s (the
    # materialization costs more than the line explode it saves — a
    # split+posexplode is far cheaper than the shingle/token transforms
    # the spread seams parallelize elsewhere). The explode runs once
    # per consumer either way; it is map-side off the scan.
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lkey", norm(F.col("_line")))
    # eligibility (min_chars) is applied to the FREQUENT SET, not by
    # splitting the line stream: a filter/anti-join/union split would
    # re-run the explode lineage three times (no cross-branch CSE);
    # this shape scans the corpus exactly twice (count + anti-join)
    frequent = (
        lines.groupBy("_lkey")
        .agg(F.countDistinct(id_col).alias("_ndocs"))
        .filter(
            (F.col("_ndocs") >= min_docs) & (F.length("_lkey") >= min_chars)
        )
        .select("_lkey")
    )
    kept = lines.join(frequent, "_lkey", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_rebuilt")
    )
    # NULL text stays NULL: split(NULL) explodes to no rows, so such a
    # doc is absent from the rebuild — the empty-string substitution is
    # only for docs whose every line was removed, not a null->'' rewrite
    # (downstream null-vs-empty semantics must survive this operator).
    return (
        docs.join(rebuilt, id_col, "left")
        .withColumn(
            text_col,
            F.coalesce(
                F.col("_rebuilt"),
                F.when(F.col(text_col).isNotNull(), F.lit("")),
            ),
        )
        .drop("_rebuilt")
    )


def duplicated_span_removal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
    tokenizer: str = "word",
) -> DataFrame:
    """Exact cross-document SPAN dedup: rewrite each document with every
    token covered by a duplicated ``span_tokens``-gram removed — the
    distributed form of the suffix-array substring dedup published for
    LM training corpora (remove repeated substrings of >= N tokens that
    recur across documents), at token granularity.  Line dedup only
    catches boilerplate that happens to align with line breaks; licence
    paragraphs, templated sentences, and quoted chunks embedded
    mid-paragraph need span-level removal.

    A K-token gram whose whitespace-normalized key occurs in
    >= ``min_docs`` DISTINCT documents flags positions ``p..p+K-1`` in
    every document containing it; overlapping flagged grams merge into
    maximal spans (so a duplicated run of length L >= K is removed in
    full).  Text is rebuilt from surviving tokens joined by single
    spaces — intra-document whitespace is normalized as a side effect
    (tokenization is whitespace-split), the same contract published
    recipes accept.  Documents shorter than ``span_tokens`` tokens
    carry no grams and are never rewritten beyond the whitespace
    normalization; NULL text stays NULL; a document whose every token
    is removed keeps its row with empty text.

    Scale shape: all native expressions, linear shuffles only —
    gram keys explode from a per-document ``transform`` over the token
    array (O(K) slice per position, interpreted per element but
    bounded by the document's own length), ONE partial-agg
    countDistinct per gram key, an equi-join of grams against the
    frequent-key set (AQE handles hot keys; the set is O(corpus
    grams), never broadcast or collected), a per-document
    gaps-and-islands window that merges overlapping flagged grams into
    disjoint spans BEFORE exploding covered token indices (so a
    duplicated region of length L costs L rows, not (L-K+1) x K), a
    left-anti join of token positions against covered indices, and the
    same order-preserving array_sort rebuild as
    :func:`duplicated_line_removal`.

    Returns ``docs`` with ``text_col`` rewritten.
    """
    from pyspark.sql import Window

    k = int(span_tokens)
    _validate_tokenizer(tokenizer)
    if tokenizer == "auto":
        # unsegmented-dominant docs tokenize as SINGLE CHARACTERS
        # INCLUDING their whitespace (the only unit that rebuilds
        # losslessly — overlapping bigrams cannot, and stripping
        # whitespace before tokenizing would delete the content spaces
        # of embedded Latin runs on every routed doc, removal or not —
        # round-12 review finding), so span_tokens means span CHARS for
        # them and the rebuild joins with '' (each token IS the
        # original character, spaces included).  Spaced docs keep the
        # word tokens bit-for-bit.
        word_toks = F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        )
        char_toks = F.expr(
            f"CASE WHEN length({text_col}) = 0 THEN "
            f"CAST(array() AS ARRAY<STRING>) ELSE "
            f"transform(sequence(1, length({text_col})), "
            f"i -> substring({text_col}, i, 1)) END"
        )
        toks = F.when(
            unsegmented_dominant(text_col), char_toks
        ).otherwise(word_toks)
    else:
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        )
    # spread before the tokenize: the gram transform below is the
    # operator's dominant per-row cost (interpreted higher-order
    # lambda) and must not serialize on a one-split scan (no-op at
    # scale).
    base = _spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), toks.alias("_toks")
    )
    n = F.size("_toks")
    gram_arr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("_gpos"),
                F.array_join(F.slice("_toks", i + 1, k), " ").alias("_gkey"),
            ),
        ),
    ).otherwise(F.array())
    # Two consumers of the exploded grams (the frequent-set aggregate
    # and the flagged join side) and Spark has no cross-branch CSE:
    # without truncation the per-position gram transform — the
    # operator's dominant cost — executes twice over the corpus.
    # Materialize the postings once (the shared_substring_pairs /
    # jaccard_pairs discipline).
    grams = base.select(
        id_col, F.explode(gram_arr).alias("_g")
    ).select(
        id_col, F.col("_g._gpos").alias("_gpos"), F.col("_g._gkey").alias("_gkey")
    ).localCheckpoint()
    frequent = (
        grams.groupBy("_gkey")
        .agg(F.countDistinct(id_col).alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select("_gkey")
    )
    flagged = grams.join(frequent, "_gkey").select(id_col, "_gpos")
    # merge overlapping [p, p+K-1] intervals per document: a new island
    # starts where the gram no longer touches the running coverage
    w = Window.partitionBy(id_col).orderBy("_gpos")
    prev_max = F.max("_gpos").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = flagged.withColumn(
        "_brk",
        F.when(prev_max.isNull() | (F.col("_gpos") > prev_max + k), 1).otherwise(0),
    ).withColumn("_island", F.sum("_brk").over(w))
    covered = (
        flagged.groupBy(id_col, "_island")
        .agg(F.min("_gpos").alias("_s"), (F.max("_gpos") + k - 1).alias("_e"))
        .select(id_col, F.explode(F.sequence("_s", "_e")).alias("_tpos"))
    )
    tokens = base.select(
        id_col, F.posexplode("_toks").alias("_tpos", "_tok")
    )
    kept = tokens.join(covered, [id_col, "_tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_tpos", "_tok"))),
            lambda s: s["_tok"],
        ).alias("_kept_arr")
    )
    # same null contract as duplicated_line_removal: NULL text never
    # becomes '' (no tokens -> absent from the rebuild -> the when()
    # guard leaves it NULL); all-removed documents get empty text.
    # Unsegmented-dominant docs under 'auto' rebuild with NO separator:
    # their tokens are the original characters verbatim (spaces
    # included), so ''-join is the lossless inverse of tokenization.
    joined = F.array_join(F.col("_kept_arr"), " ")
    if tokenizer == "auto":
        joined = F.when(
            unsegmented_dominant(text_col),
            F.array_join(F.col("_kept_arr"), ""),
        ).otherwise(joined)
    out_text = F.coalesce(
        F.when(F.col("_kept_arr").isNotNull(), joined),
        F.when(F.col(text_col).isNotNull(), F.lit("")),
    )
    return (
        docs.join(rebuilt, id_col, "left")
        .withColumn(text_col, out_text)
        .drop("_kept_arr")
    )


def simhash_pairs_allpairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 6,
) -> DataFrame:
    """All-pairs SimHash reference (quadratic) — the test oracle for
    :func:`simhash_pairs`; never the production path."""
    sig = simhash(df, text_col, id_col, bits)
    a = sig.select(F.col(id_col).alias("id1"), F.col("simhash").alias("h1"))
    b = sig.select(F.col(id_col).alias("id2"), F.col("simhash").alias("h2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


def _sig_match_estimate(k: int) -> F.Column:
    """Estimated Jaccard between two joined signature rows (columns
    mh_i vs __h_mh_i): the fraction of agreeing minhashes — the standard
    unbiased MinHash estimator, no shingle sets needed."""
    agree = None
    for i in range(k):
        t = (F.col(f"mh_{i}") == F.col(f"__h_mh_{i}")).cast("int")
        agree = t if agree is None else agree + t
    return agree / F.lit(k)


def incremental_near_dedup(
    new_docs: DataFrame,
    history_sigs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.7,
    tokenizer: str = "word",
    normalize_form: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """NEAR-duplicate novelty filter for a growing corpus — the fuzzy
    twin of :func:`incremental_dedup` (which only catches byte-identical
    text): an incoming shard keeps only documents that are near-novel
    both within the shard and against the WHOLE historical corpus, with
    history represented by its compact minhash signatures, never its
    text.

    ``history_sigs`` is the running ``(id, mh_0..mh_{k-1})`` signature
    table persisted next to the lake (append the returned delta after
    each shard); ``None`` is a cold start. Returns ``(novel_docs,
    signature_delta)``.

    Mechanics: banded-LSH candidate generation (band-key equi joins —
    linear, never all-pairs) within the shard and shard-vs-history, then
    the MinHash agreement fraction as the Jaccard estimate; a document
    drops when any candidate partner estimates >= ``threshold``
    (within-shard the SMALLER id survives — greedy keep-min, which can
    over-drop across chains relative to transitive clustering; that is
    the conservative direction for dedup). Exact duplicates estimate
    1.0, so this subsumes the exact filter. State is O(docs) x k longs —
    at 100 TB the signature table is ~1/10000th of the corpus, and the
    per-shard cost is the shard's own signatures plus band-key joins.

    ``tokenizer`` — and, as of round 13, ``normalize_form`` — must
    stay CONSTANT for the lifetime of a signature history: signatures
    built under different tokenizers or normalization forms never
    estimate correctly against each other (a mid-history form flip
    silently re-admits every NFD/NFC near-duplicate of history).
    """
    sigs = minhash_signatures(
        new_docs, text_col, id_col, n, k, tokenizer,
        normalize_form=normalize_form,
    ).localCheckpoint()
    bands = _sig_band_keys(sigs, id_col, k, rows_per_band).localCheckpoint()
    hist_rename = [F.col(id_col).alias("__h_id")] + [
        F.col(f"mh_{i}").alias(f"__h_mh_{i}") for i in range(k)
    ]

    # within-shard: keep the min-id representative of every near pair
    within_cand = _band_candidate_pairs(bands, id_col).select(
        F.col("id1").alias("__a"), F.col("id2").alias("__b")
    )
    within_scored = (
        within_cand.join(sigs.select(F.col(id_col).alias("__b"), *[f"mh_{i}" for i in range(k)]), "__b")
        .join(
            sigs.select(F.col(id_col).alias("__a"), *hist_rename[1:]),
            "__a",
        )
    )
    dropped = (
        within_scored.filter(_sig_match_estimate(k) >= threshold)
        .select(F.col("__b").alias(id_col))
        .distinct()
    )

    if history_sigs is not None:
        hb = _sig_band_keys(history_sigs, id_col, k, rows_per_band).select(
            F.col(id_col).alias("__h_id"), "band", "bkey"
        )
        hist_cand = (
            bands.join(hb, ["band", "bkey"]).select(id_col, "__h_id").distinct()
        )
        hist_scored = (
            hist_cand.join(sigs, id_col)
            .join(history_sigs.select(*hist_rename), "__h_id")
        )
        dropped_hist = (
            hist_scored.filter(_sig_match_estimate(k) >= threshold)
            .select(id_col)
            .distinct()
        )
        dropped = dropped.unionByName(dropped_hist).distinct()

    novel = new_docs.join(dropped, id_col, "left_anti")
    sig_delta = sigs.join(dropped, id_col, "left_anti")
    return novel, sig_delta
