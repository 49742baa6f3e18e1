"""Pin the driver CORRECTNESS window contents.

The external driver hash-verifies only the first ``DRIVER_WINDOW_SIZE``
registry entries, in iteration order.  These tests guarantee that every
SURVEY §2 operator's query sits inside that window and that nothing in the
window lacks a DuckDB oracle (which would waste a verified slot).
"""

from polygon_io_data_ingestion_pipeline_spark.plans.queries import (
    DRIVER_WINDOW_SIZE,
    _DEFERRED_PAST_WINDOW,
    REGISTRY,
)

# Queries that MUST receive an external driver CORRECTNESS row.  The three
# round-2 orphans (J5/J6 series joins + the W8 declared-gap reconcile) head
# the list; the rest is a spot-check of one query per §2 operator family.
MUST_BE_WINDOWED = [
    "events_gap_declared_reconcile",
    "series_day_calendar_join",
    "series_minute_exact_join",
    "tpch_q01_pricing_summary",
    "corporate_actions_adjust",
    "events_asof_forward_snap",
    "events_scd_window_join",
    "events_split_gap_inference",
    "dedup_ngram_jaccard_pairs",
    # MinHash+LSH machinery is externally verified via the SUPERSET
    # query (dedup_lsh_verified_pairs computes the candidate pairs
    # internally before the exact-Jaccard verify); the candidates-only
    # query was demoted in round 5 for tpch_q14 (part-table coverage).
    "dedup_lsh_verified_pairs",
    "dedup_simhash_pairs",
    # RP-LSH near-dup machinery is externally verified via the SUPERSET
    # query (emb_semantic_dedup_clusters computes the same candidate +
    # exact-verify pair set before the transitive closure); the
    # pairs-only query was demoted in round 5.
    "emb_cosine_topk",
    "emb_ivf_topk",
    "docs_token_stats",
    # Round-3 capability additions — each is a distinct operator family
    # member (transitive-closure dup clustering, PQ/ADC ANN) and must
    # hold a driver-verified slot. (Winnowing fingerprints moved to the
    # superset query docs_shared_substring_pairs in round 5.)
    "dedup_duplicate_clusters",
    "emb_pq_topk_rerank",
    # Round-4 additions: repetition quality metrics, benchmark
    # decontamination, semantic dedup clustering.
    "docs_repetition_metrics",
    "docs_decontam_overlap",
    "emb_semantic_dedup_clusters",
    "docs_sequence_packing",
    # Round-4 additions windowed in round 5 (the round-4 verdict's defect):
    # deterministic split/mixture sampling, TF-IDF keyword extraction,
    # approximate kNN join, funnel conversion.
    "docs_split_and_sample",
    "docs_tfidf_top_terms",
    "emb_knn_join",
    "events_funnel_conversion",
    # Window-composition constraints from the round-4 verdict: keep one
    # grouping-set demo and one semi/anti demo externally verified.
    "region_nation_rollup_totals",
    "customers_with_orders_semi",
    # Round-5 addition: the only registry query on the part table.
    "tpch_q14_promo_revenue",
    # Round-5 additions, second batch: cross-corpus duplicated-n-gram
    # fraction, temperature-scaled mixture weights, PII scrubbing.
    "docs_dup_ngram_fraction",
    "docs_mixture_weights",
    "customers_pii_scrub",
    # Round-5 additions, third batch: context-window chunking,
    # classifier-based quality scoring, MOSS shared-substring pairs.
    "docs_chunk_windows",
    "docs_quality_score",
    "docs_shared_substring_pairs",
    # Round-5 additions, fourth batch: exact column profiling and the
    # constraint-report quality gate.
    "orders_profile",
    "orders_quality_report",
    # Round-5 additions, fifth batch: unigram-LM quality scoring and
    # cohort retention analysis.
    "docs_unigram_logprob",
    "events_retention_cohorts",
    # Round-5 additions, sixth batch: iterative graph centrality with a
    # fully unrolled SQL oracle.
    "docs_pagerank_centrality",
]


def test_every_new_capability_is_pinned():
    """Every registered query must be pinned: either named in
    MUST_BE_WINDOWED (external driver row) or explicitly listed in
    _DEFERRED_PAST_WINDOW (in-repo parity only).  A query in neither list is
    an unreviewed window decision — exactly the round-2/round-4 defect where
    new capabilities silently fell outside the verified window."""
    pinned = set(MUST_BE_WINDOWED) | set(_DEFERRED_PAST_WINDOW)
    window = set(window_names())
    # Long-standing windowed queries registered before this gate existed are
    # grandfathered only if they are inside the window (so any future
    # registration that pushes one out fails test_required_queries_inside_
    # driver_window or this assertion and forces a deliberate choice).
    unpinned_outside = [n for n in REGISTRY if n not in pinned and n not in window]
    assert not unpinned_outside, (
        "queries outside the driver window but not deliberately deferred: "
        f"{unpinned_outside}"
    )


def window_names() -> list[str]:
    return list(REGISTRY)[:DRIVER_WINDOW_SIZE]


def test_required_queries_inside_driver_window():
    window = set(window_names())
    missing = [n for n in MUST_BE_WINDOWED if n not in window]
    assert not missing, f"queries fell out of the driver window: {missing}"


def test_window_slots_all_have_oracles():
    lacking = [n for n in window_names() if not REGISTRY[n].oracle]
    assert not lacking, f"windowed queries without oracle SQL: {lacking}"


def test_deferred_queries_exist_and_iterate_last():
    names = list(REGISTRY)
    for n in _DEFERRED_PAST_WINDOW:
        assert n in REGISTRY, f"deferred name {n!r} not registered"
        assert names.index(n) >= DRIVER_WINDOW_SIZE
