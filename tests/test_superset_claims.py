"""Executed subset/consistency checks behind the window's "⊂" arguments.

Several registry queries earn external verification via a SUPERSET query
that computes their machinery internally (e.g. the LSH-verified pair
query computes the candidate pairs before the exact-Jaccard verify).
Rotation now gives every query its own external row over time, but the
subset relations themselves were English arguments — these tests execute
them: each claim becomes a cross-query assertion between the two registry
RESULTS, so a parity bug in either side breaks a test instead of hiding
behind prose.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.plans.queries import REGISTRY


def _run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def test_verified_lsh_pairs_are_a_subset_of_minhash_candidates(spark, sf_dir):
    """dedup_lsh_verified_pairs ⊂ dedup_minhash_lsh_candidates: every
    verified pair must have been a banded-minhash candidate, and carry a
    Jaccard at or above the verify threshold."""
    verified = _run(spark, sf_dir, "dedup_lsh_verified_pairs")
    cands = _run(spark, sf_dir, "dedup_minhash_lsh_candidates")
    orphans = verified.select("id1", "id2").join(cands, ["id1", "id2"], "left_anti")
    assert orphans.count() == 0
    assert verified.filter(F.col("jaccard") < 0.5).count() == 0
    assert verified.count() > 0  # non-vacuous at this sf


def test_simhash_pair_hamming_matches_the_signatures(spark, sf_dir):
    """dedup_simhash_signatures ⊂ dedup_simhash_pairs: recomputing each
    reported pair's Hamming distance from the signature query's output
    must reproduce the pair query's distance column."""
    sigs = _run(spark, sf_dir, "dedup_simhash_signatures")
    pairs = _run(spark, sf_dir, "dedup_simhash_pairs")
    joined = (
        pairs.join(sigs.select(F.col("doc_id").alias("id1"), F.col("simhash").alias("s1")), "id1")
        .join(sigs.select(F.col("doc_id").alias("id2"), F.col("simhash").alias("s2")), "id2")
        .withColumn("h2", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
    )
    assert pairs.count() > 0
    assert joined.filter(F.col("h2") != F.col("hamming")).count() == 0
    assert joined.count() == pairs.count()  # every pair's ids exist in sigs


def test_rp_lsh_pairs_collide_in_the_bucket_query(spark, sf_dir):
    """emb_rp_lsh_buckets ⊂ emb_rp_lsh_candidate_pairs: both sides of
    every candidate pair must hold the pair's bucket in the bucket
    query's output (same 8-plane sign-LSH definition)."""
    buckets = _run(spark, sf_dir, "emb_rp_lsh_buckets")
    pairs = _run(spark, sf_dir, "emb_rp_lsh_candidate_pairs")
    j = (
        pairs.join(
            buckets.select(F.col("vec_id").alias("id1"), F.col("bucket").alias("b1")), "id1"
        ).join(
            buckets.select(F.col("vec_id").alias("id2"), F.col("bucket").alias("b2")), "id2"
        )
    )
    assert pairs.count() > 0
    assert j.filter((F.col("b1") != F.col("bucket")) | (F.col("b2") != F.col("bucket"))).count() == 0


def test_semantic_clusters_are_components_of_neardup_pairs(spark, sf_dir):
    """emb_cosine_neardup_pairs ⊂ emb_semantic_dedup_clusters: the
    cluster query's partition must be exactly the connected components of
    the near-dup pair graph — same component ⟺ same cluster."""
    pairs = _run(spark, sf_dir, "emb_cosine_neardup_pairs").select("id1", "id2").collect()
    clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in _run(spark, sf_dir, "emb_semantic_dedup_clusters").collect()
    }
    # union-find over the collected pair edges (tiny at this sf)
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["id1"]), find(r["id2"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert pairs, "no near-dup pairs at this sf — claim test is vacuous"
    for v in clusters:
        find(v)
    comp = {v: find(v) for v in clusters}
    # same component ⟺ same cluster id (bijective relabeling allowed)
    seen: dict[int, int] = {}
    for v, c in comp.items():
        if c in seen:
            assert clusters[v] == seen[c], f"component split across clusters at vec {v}"
        else:
            seen[c] = clusters[v]
    assert len(set(seen.values())) == len(seen), "distinct components merged into one cluster"


def test_ivf_list_sizes_partition_the_corpus(spark, sf_dir):
    """emb_ivf_list_sizes ⊂ emb_ivf_topk: the inverted lists are a true
    partition of the corpus — sizes sum to the embedding count and no
    more than nlist lists exist."""
    sizes = _run(spark, sf_dir, "emb_ivf_list_sizes")
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = sizes.collect()
    assert sum(r["n_vectors"] for r in rows) == n_emb
    assert len(rows) <= 16


def test_overnight_gap_is_derivable_from_day_edges(spark, sf_dir):
    """events_day_edges ⊂ events_overnight_gap: recomputing the gap from
    the edge query's (first_value, last_value) must reproduce the gap
    query (to rounding: edges round at 6dp before this re-derivation,
    the gap query rounds after the division)."""
    edges = _run(spark, sf_dir, "events_day_edges")
    gaps = _run(spark, sf_dir, "events_overnight_gap")
    w = Window.partitionBy("user_id").orderBy("day")
    re_gap = (
        edges.withColumn("prev_last", F.lag("last_value").over(w))
        .filter(F.col("prev_last").isNotNull())
        .select("user_id", "day", (F.col("first_value") / F.col("prev_last")).alias("g"))
    )
    j = gaps.join(re_gap, ["user_id", "day"])
    assert gaps.count() > 0
    assert j.count() == gaps.count()
    assert j.filter(F.abs(F.col("g") - F.col("overnight_gap")) > 1e-4).count() == 0


def test_shared_substring_pairs_agree_with_winnow_fingerprints(spark, sf_dir):
    """docs_winnow_fingerprints ⊂ docs_shared_substring_pairs: each
    reported pair's shared-fingerprint count must be achievable from the
    fingerprint query's sets — positive, and at most the true
    intersection size (the hot-fingerprint cap can only remove matches,
    never invent them)."""
    fps = _run(spark, sf_dir, "docs_winnow_fingerprints").select(
        "doc_id", F.split("fp_str", ",").alias("fp")
    )
    pairs = _run(spark, sf_dir, "docs_shared_substring_pairs")
    j = (
        pairs.join(fps.select(F.col("doc_id").alias("id1"), F.col("fp").alias("f1")), "id1")
        .join(fps.select(F.col("doc_id").alias("id2"), F.col("fp").alias("f2")), "id2")
        .withColumn("true_shared", F.size(F.array_intersect("f1", "f2")))
    )
    assert pairs.count() > 0
    assert j.count() == pairs.count()
    bad = j.filter((F.col("n_shared") < 1) | (F.col("n_shared") > F.col("true_shared")))
    assert bad.count() == 0
