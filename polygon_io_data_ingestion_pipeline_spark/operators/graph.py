"""Iterative graph algorithms over edge DataFrames.

Companion to the connected-components labeller in
:mod:`.dedup` (``duplicate_clusters``): PageRank-style centrality over
the same near-duplicate graphs. On a training corpus, high-centrality
nodes in the similarity graph are the template/boilerplate hubs —
pages that partially overlap *many* others without being exact
duplicates of any single one — which per-pair dedup never surfaces.

Scale shape per power iteration: one keyed join of the edge list with
the current ranks (on the source key) and one partial-agg shuffle on
the destination — the standard distributed PageRank step. No
driver-side graph, no per-node loops; iterations are a fixed unroll
(K is small for centrality screening) so the lineage stays shallow and
the whole computation remains ONE declarative plan an engine can
re-order (and, unrolled, even a SQL audit can replicate exactly).

Engine-exactness: every rank is quantized to 12 decimals per
iteration and neighbor contributions sum as scaled BIGINTs, so the
fixpoint trajectory is association-order independent and a DuckDB
audit reproduces each iteration bit-for-bit (the discipline all this
repo's float oracles share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank quantization: 12 decimals (ranks are ~1/N; 6 would be too coarse)
_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """PageRank over an UNDIRECTED graph given as unique (src, dst)
    pairs; edges are symmetrized internally. Returns
    (node, degree, rank) for every node incident to an edge.

    Symmetric graphs have no dangling mass (every out-edge has a
    reverse), so the classic simplified update is exact:
    ``r'(u) = (1-d)/N + d * sum over neighbors v of r(v)/deg(v)``.
    """
    base = round(1.0 - damping, 6)
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # The edge list is consumed once per iteration plus once for the
    # degree table; Spark re-executes lineage per consumer (no
    # cross-branch CSE), so an expensive edge-generation pipeline
    # (e.g. jaccard_pairs) would re-run K+1 times. localCheckpoint
    # truncates it to the materialized pairs — the same discipline as
    # duplicate_clusters' propagation loop.
    sym = sym.localCheckpoint()
    deg = sym.groupBy("u").agg(F.count("*").alias("degree"))
    n = deg.agg(F.count("*").alias("n"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "u", "degree", "n", F.round(F.lit(1.0) / F.col("n"), 12).alias("rank")
    )
    for _ in range(iters):
        # contribution r(v)/deg(v) flows along each (v -> u) edge;
        # quantize to scaled BIGINT so the per-node sum is exact.
        per_edge = sym.join(
            ranks.select(
                F.col("u").alias("v"),
                F.round(F.col("rank") / F.col("degree") * _SCALE, 0)
                .cast("long")
                .alias("c"),
            ),
            "v",
        )
        contribs = per_edge.groupBy("u").agg(F.sum("c").alias("s"))
        ranks = (
            ranks.drop("rank")
            .join(contribs, "u")
            .select(
                "u",
                "degree",
                "n",
                F.round(
                    F.lit(base) / F.col("n")
                    + F.lit(damping) * (F.col("s") / F.lit(float(_SCALE))),
                    12,
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("u").alias("node"), "degree", "rank")
