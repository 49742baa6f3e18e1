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
driver-side graph, no per-node loops; iterations run a fixed count of
rounds (K is small for centrality screening) with every iterate a
later round consumes materialized via ``localCheckpoint`` — lineage
stays shallow because each round starts from the materialized node
table, not because the plan is one replicable SQL lineage (building
the frame launches per-round jobs).  The VALUES are still exactly
SQL-replicable: ranks quantize to 12 decimals per round, so a SQL
audit unrolling the same iterations reproduces the trajectory
bit-for-bit.

Engine-exactness: every rank is quantized to 12 decimals per
iteration and neighbor contributions sum as scaled BIGINTs, so the
fixpoint trajectory is association-order independent and a DuckDB
audit reproduces each iteration bit-for-bit (the discipline all this
repo's float oracles share).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank quantization: 12 decimals (ranks are ~1/N; 6 would be too coarse)
_SCALE = 1_000_000_000_000


def _rank_delta(old: DataFrame, new: DataFrame, key: str, col: str) -> float:
    """Max |new - old| over the shared key — the ONE-action-per-round
    convergence probe (the star-contraction ``_sig`` discipline) behind
    the graph iterators' ``tol=`` mode."""
    row = (
        old.select(F.col(key).alias("__k"), F.col(col).alias("__o"))
        .join(
            new.select(F.col(key).alias("__k"), F.col(col).alias("__n")), "__k"
        )
        .agg(F.max(F.abs(F.col("__n") - F.col("__o"))).alias("d"))
        .collect()[0]
    )
    return float(row["d"] or 0.0)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "id1",
    dst: str = "id2",
    tol: float | None = None,
    max_iter: int = 200,
    return_iters: bool = False,
) -> DataFrame:
    """PageRank over an UNDIRECTED graph given as unique (src, dst)
    pairs; edges are symmetrized internally. Returns
    (node, degree, rank) for every node incident to an edge.

    Symmetric graphs have no dangling mass (every out-edge has a
    reverse), so the classic simplified update is exact:
    ``r'(u) = (1-d)/N + d * sum over neighbors v of r(v)/deg(v)``.

    Two modes: the default FIXED ITERATION COUNT (``iters`` rounds,
    each consumed iterate materialized via ``localCheckpoint`` so
    lineage stays shallow — building the frame launches per-round jobs;
    right for centrality screening) and,
    with ``tol=``, RUN-TO-FIXPOINT: iterate to ``max_iter`` rounds,
    stopping once the max per-node rank change falls to ``tol`` (one
    1-row probe action + a localCheckpoint per round — ranking-grade
    output).  ``return_iters=True`` returns ``(ranks, rounds_run)``.
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
    # Each loop pass consumes the current iterate TWICE (contribution
    # join + rank join) and Spark has no cross-branch CSE: left lazy,
    # iteration i's lineage re-executes once per consumer of iteration
    # i+1 — ~2^k plan growth for k fixed iterations. Materialize every
    # iterate that another iteration will consume (node-sized — tiny
    # next to the edge list); the FINAL iterate stays lazy, its single
    # consumer is the caller's one action. Values are unchanged: ranks
    # are quantized to 12 decimals each round, so materialization
    # cannot perturb the trajectory.
    if iters > 0 or tol is not None:
        ranks = ranks.localCheckpoint(eager=True)
    rounds = 0
    converged = False
    for _ in range(iters if tol is None else max_iter):
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
        new_ranks = (
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
        rounds += 1
        if tol is not None:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            if _rank_delta(ranks, new_ranks, "u", "rank") <= tol:
                ranks = new_ranks
                converged = True
                break
        elif rounds < iters:
            # fixed-iteration mode: the next pass consumes this iterate
            # twice — same materialize-the-iterate rule as tol mode
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
    if tol is not None and not converged:
        warnings.warn(
            f"pagerank: tol={tol} not reached within max_iter={max_iter} "
            "rounds; returning the best iterate", stacklevel=2,
        )
    out = ranks.select(F.col("u").alias("node"), "degree", "rank")
    return (out, rounds) if return_iters else out


def triangle_stats(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Per-node triangle participation and local clustering coefficient
    over an undirected graph given as canonical (src < dst) pairs.

    On a near-duplicate graph this separates *chains* (A~B~C where A
    and C differ too much to pair — transitive-closure clusters catch
    these) from *cliques* (every pair close — true template families):
    high clustering marks the boilerplate sets worth a single canonical
    representative, low clustering marks drift chains that need the
    more careful review.

    Scale shape — the standard distributed triangle enumeration: with
    edges ordered (a < b), every triangle a<b<c is found EXACTLY once
    by joining wedges (a,b)+(b,c) on the middle node and closing with
    an equi join on (a,c). Two keyed joins, no driver-side graph; the
    wedge join's fan-out is sum of deg², the quantity a degree cap
    bounds on skewed graphs (cap hubs upstream — e.g. the df caps the
    dedup family already applies — before counting triangles).

    Returns (node, degree, n_triangles, clustering) where clustering =
    2*t / (deg*(deg-1)) — exact-integer inputs to one IEEE division, so
    oracles replay exactly.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    wedges = e.alias("e1").join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2"), "b"
    )
    tri = wedges.join(
        e.select(F.col("a").alias("a"), F.col("b").alias("c")).alias("e3"),
        ["a", "c"],
    ).select("a", "b", "c")
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )
    return out.withColumn(
        "clustering",
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


def pagerank_directed(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    tol: float | None = None,
    max_iter: int = 200,
    init_ranks: DataFrame | None = None,
    return_iters: bool = False,
) -> DataFrame:
    """PageRank over a DIRECTED edge list — the web-link-graph variant
    (:func:`pagerank` symmetrizes, which is right for similarity graphs
    but erases the endorsement direction hyperlinks carry).  Returns
    ``(node, out_degree, rank)`` for every node incident to an edge.

    Classic formulation with DANGLING-NODE handling: a node with no
    out-edges (every crawl frontier leaf) redistributes its mass
    uniformly, so rank is conserved instead of leaking each iteration:

        r'(u) = (1-d)/N + d * (sum over v->u of r(v)/outdeg(v)
                               + dangling_mass / N)

    Scale shape per iteration: one keyed join of the edge list with the
    ranks on the source key, one partial-agg shuffle on the
    destination, and a ONE-ROW dangling-mass aggregate broadcast back —
    no driver-side graph, no windows.  Engine-exactness discipline
    shared with :func:`pagerank`: ranks quantize to 12 decimals per
    iteration and both the per-edge contributions and the dangling mass
    sum as scaled BIGINTs, so a SQL oracle unrolling the same
    iterations reproduces the trajectory bit-for-bit.

    ``tol=`` switches the fixed unroll to run-to-fixpoint (stop when
    the max per-node rank change falls to ``tol``, ``max_iter`` cap,
    one 1-row probe + localCheckpoint per round — ranking-grade
    output).  ``init_ranks`` WARM-STARTS from a previous run's
    ``(node, rank)`` table (incremental webgraph maintenance: the
    fixpoint is unique, so seeding with last run's ranks converges in
    fewer rounds on a grown graph; nodes new since then start at 1/N).
    ``return_iters=True`` returns ``(ranks, rounds_run)``."""
    base = round(1.0 - damping, 6)
    e = edges.select(F.col(src).alias("v"), F.col(dst).alias("u")).localCheckpoint()
    nodes = (
        e.select(F.col("v").alias("node"))
        .union(e.select(F.col("u").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("v").agg(F.count("*").alias("out_degree"))
    n = nodes.agg(F.count("*").alias("n"))
    ranks = (
        nodes.join(outdeg, nodes["node"] == outdeg["v"], "left")
        .select(
            "node", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
        )
        .crossJoin(F.broadcast(n))
        .select(
            "node", "out_degree", "n",
            F.round(F.lit(1.0) / F.col("n"), 12).alias("rank"),
        )
    )
    if init_ranks is not None:
        # warm ranks + 1/N for new nodes sum to MORE than 1; the
        # iteration preserves total mass toward ITS total's fixpoint,
        # so an unnormalized warm vector converges to a scaled — wrong —
        # fixpoint.  Renormalize to mass 1 (one 1-row aggregate, warm
        # start only).
        prev = init_ranks.select(
            F.col("node"), F.col("rank").alias("__prev")
        )
        seeded = ranks.join(prev, "node", "left").withColumn(
            "rank", F.coalesce("__prev", "rank")
        ).drop("__prev")
        total = seeded.agg(F.sum("rank").alias("__t"))
        ranks = (
            seeded.crossJoin(F.broadcast(total))
            .withColumn("rank", F.round(F.col("rank") / F.col("__t"), 12))
            .drop("__t")
        )
    # Each loop pass consumes the current iterate THREE times
    # (contribution join, dangling aggregate, rank join); no
    # cross-branch CSE, so left lazy the lineage re-executes ~3^k times
    # over k fixed iterations — the 2-iteration registry pagerank
    # planned 122 exchanges, with the edge-sized nodes-distinct and
    # outdeg shuffles each executing 9x. Materialize every iterate a
    # later iteration consumes (node-sized); the final one stays lazy.
    # Ranks quantize to 12 decimals per round, so values are unchanged.
    if iters > 0 or tol is not None:
        ranks = ranks.localCheckpoint(eager=True)
    rounds = 0
    converged = False
    for _ in range(iters if tol is None else max_iter):
        per_edge = e.join(
            ranks.filter(F.col("out_degree") > 0).select(
                F.col("node").alias("v"),
                F.round(F.col("rank") / F.col("out_degree") * _SCALE, 0)
                .cast("long")
                .alias("c"),
            ),
            "v",
        )
        contribs = per_edge.groupBy("u").agg(F.sum("c").alias("s"))
        dangling = ranks.filter(F.col("out_degree") == 0).agg(
            F.coalesce(
                F.sum(F.round(F.col("rank") * _SCALE, 0).cast("long")), F.lit(0)
            ).alias("dang")
        )
        new_ranks = (
            ranks.drop("rank")
            .join(contribs, ranks["node"] == contribs["u"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "out_degree", "n",
                F.round(
                    F.lit(base) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0)) / F.lit(float(_SCALE))
                        + F.col("dang") / F.lit(float(_SCALE)) / F.col("n")
                    ),
                    12,
                ).alias("rank"),
            )
        )
        rounds += 1
        if tol is not None:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            if _rank_delta(ranks, new_ranks, "node", "rank") <= tol:
                ranks = new_ranks
                converged = True
                break
        elif rounds < iters:
            # fixed-iteration mode: the next pass consumes this iterate
            # three times — same materialize-the-iterate rule as tol mode
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
    if tol is not None and not converged:
        warnings.warn(
            f"pagerank_directed: tol={tol} not reached within "
            f"max_iter={max_iter} rounds; returning the best iterate",
            stacklevel=2,
        )
    out = ranks.select("node", "out_degree", "rank")
    return (out, rounds) if return_iters else out


def connected_components_star(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    all_ids: DataFrame | None = None,
    id_col: str = "node",
    max_iter: int = 20,
    prior_labels: DataFrame | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log n) rounds on ANY graph shape, vs the O(component
    diameter) rounds of :func:`..dedup.duplicate_clusters`' min-label
    propagation.  Near-dup clusters are cliques-ish so label
    propagation is the right tool there; the WEB graph is not — host
    chains, redirect ladders, and deep site hierarchies give
    long-diameter components where propagation would need hundreds of
    rounds and this needs a handful.

    - large-star: every node connects its LARGER neighbors to the
      minimum of its neighborhood (incl. itself);
    - small-star: every node connects its not-larger neighbors and
      itself to that minimum.

    Both steps preserve connectivity; alternation contracts every
    component to a star whose center is the component minimum (ids
    compare with their natural ordering — for string URL nodes the
    canonical id is the lexicographic minimum).  Self-loops and NULL
    endpoints are dropped.

    Returns ``(id_col, component_id)``; ``all_ids`` adds isolated nodes
    as singleton components of themselves (the
    :func:`..dedup.duplicate_clusters` convention).

    ``prior_labels`` WARM-STARTS incremental maintenance: a previous
    run's ``(id_col, component_id)`` table joins the edge set as
    pre-contracted (node -> old label) edges.  Labels only assert
    connectivity that already held, so the result on the grown graph
    EQUALS a full recompute — but every previously-labelled component
    enters already star-shaped, so only the delta's structure costs
    contraction rounds.

    Scale shape per round: two grouped min-aggregations and two keyed
    joins (all partial-agg hash shuffles on the node key), one
    ``distinct`` to canonicalize the shrinking edge set, and one count
    action for convergence — no driver-side graph, no Python.  Each
    round ``localCheckpoint``s the edge set: iterative lineage would
    otherwise nest exponentially AND re-run the (expensive) upstream
    edge generation every round.
    """
    def _sig(df: DataFrame) -> tuple:
        # ONE partial-agg action per round: (edge count, xxhash64 sum)
        # as the set-equality proxy over the canonical distinct edge
        # set — two exceptAll legs per round would cost more than the
        # round itself on small/converging graphs
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: a LONG sum of 64-bit hashes overflows under
            # ANSI mode on the second row
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    base_edges = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    )
    if prior_labels is not None:
        base_edges = base_edges.unionByName(
            prior_labels.select(
                F.col(id_col).alias("a"), F.col("component_id").alias("b")
            )
        )
    e = (
        base_edges
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = _sig(e)
    converged = sig[0] == 0  # no edges -> nothing to contract
    for _ in range(max_iter):
        if converged:
            break
        # large-star over the symmetrized neighborhood
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges now all point large -> small
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(
                F.explode(F.array(F.col("v"), F.col("u"))).alias("u"),
                F.col("m").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(small)
        e = small
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # max_iter exhausted with the edge set still changing: the labels
        # below would be PARTIALLY contracted (silently wrong components).
        # 20 alternations cover any graph that fits a cluster (O(log n)),
        # so hitting this means max_iter was lowered or the input is
        # pathological — fail loudly rather than return wrong labels.
        raise RuntimeError(
            f"connected_components_star: star contraction did not converge "
            f"within max_iter={max_iter} rounds; component labels would be "
            f"incomplete. Raise max_iter."
        )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    out = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("component_id")
    ).select(F.col("u").alias(id_col), "component_id")
    if all_ids is not None:
        singles = all_ids.select(id_col).join(
            out.select(id_col), id_col, "left_anti"
        )
        out = out.unionByName(
            singles.withColumn("component_id", F.col(id_col))
        )
    return out


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    tol: float | None = None,
    max_iter: int = 200,
    init_ranks: DataFrame | None = None,
    return_iters: bool = False,
) -> DataFrame:
    """Seeded (personalized) PageRank over a directed edge list — the
    TrustRank construction (Gyongyi et al., "Combating Web Spam with
    TrustRank"): teleport mass lands ONLY on a hand-vetted seed set,
    so trust flows outward along links and pages unreachable from any
    seed score zero.  The standard crawl-quality companion to plain
    PageRank: rank says "important", trust says "important AND
    reachable from pages we vetted" — spam farms rank, but don't
    trust.

    Same shape and engine-exactness discipline as
    :func:`pagerank_directed` (one keyed join + one partial-agg
    shuffle + a one-row dangling aggregate per iteration; ranks
    quantized to 12 decimals, contributions summed as scaled BIGINTs),
    with two TrustRank-specific differences: the initial vector and
    the teleport are uniform over the seeds PRESENT IN THE GRAPH
    (seeds naming absent nodes are ignored — counting them would leak
    mass), and dangling mass redistributes to the seeds, not
    uniformly.  Returns ``(node, out_degree, trust)``; an empty
    effective seed set yields all-zero trust rather than an error.

    ``tol=`` / ``max_iter`` / ``init_ranks`` (a previous run's
    ``(node, trust)`` table; nodes new since then start from the
    seed-teleport vector) / ``return_iters`` behave as in
    :func:`pagerank_directed`."""
    base = round(1.0 - damping, 6)
    e = edges.select(F.col(src).alias("v"), F.col(dst).alias("u")).localCheckpoint()
    nodes = (
        e.select(F.col("v").alias("node"))
        .union(e.select(F.col("u").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("v").agg(F.count("*").alias("out_degree"))
    seedset = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("_is_seed", F.lit(True))
    )
    flagged = nodes.join(seedset, "node", "left")
    ns = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("_is_seed"), 1).otherwise(0)), F.lit(0)
        ).alias("ns")
    )
    teleport = F.when(
        F.col("_is_seed") & (F.col("ns") > 0),
        F.round(F.lit(1.0) / F.col("ns"), 12),
    ).otherwise(F.lit(0.0))
    ranks = (
        flagged.join(outdeg, flagged["node"] == outdeg["v"], "left")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            "_is_seed",
        )
        .crossJoin(F.broadcast(ns))
        .select(
            "node", "out_degree",
            teleport.alias("t"),
        )
        .withColumn("trust", F.col("t"))
    )
    if init_ranks is not None:
        # same mass-renormalization as pagerank_directed's warm start
        # (the trust iteration also drives total mass to 1 when seeds
        # exist); an all-zero warm vector (empty seed history) is left
        # alone — dividing by zero mass would poison the vector
        prev = init_ranks.select(F.col("node"), F.col("trust").alias("__prev"))
        seeded = ranks.join(prev, "node", "left").withColumn(
            "trust", F.coalesce("__prev", "trust")
        ).drop("__prev")
        total = seeded.agg(F.sum("trust").alias("__t"))
        ranks = (
            seeded.crossJoin(F.broadcast(total))
            .withColumn(
                "trust",
                F.when(
                    F.col("__t") > 0,
                    F.round(F.col("trust") / F.col("__t"), 12),
                ).otherwise(F.col("trust")),
            )
            .drop("__t")
        )
    rounds = 0
    converged = False
    for _ in range(iters if tol is None else max_iter):
        per_edge = e.join(
            ranks.filter(
                (F.col("out_degree") > 0) & (F.col("trust") > 0)
            ).select(
                F.col("node").alias("v"),
                F.round(F.col("trust") / F.col("out_degree") * _SCALE, 0)
                .cast("long")
                .alias("c"),
            ),
            "v",
        )
        contribs = per_edge.groupBy("u").agg(F.sum("c").alias("s"))
        dangling = ranks.filter(F.col("out_degree") == 0).agg(
            F.coalesce(
                F.sum(F.round(F.col("trust") * _SCALE, 0).cast("long")),
                F.lit(0),
            ).alias("dang")
        )
        new_ranks = (
            ranks.drop("trust")
            .join(contribs, ranks["node"] == contribs["u"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "out_degree", "t",
                F.round(
                    F.lit(base) * F.col("t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0)) / F.lit(float(_SCALE))
                        + F.col("dang") / F.lit(float(_SCALE)) * F.col("t")
                    ),
                    12,
                ).alias("trust"),
            )
        )
        rounds += 1
        if tol is not None:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            if _rank_delta(ranks, new_ranks, "node", "trust") <= tol:
                ranks = new_ranks
                converged = True
                break
        ranks = new_ranks
    if tol is not None and not converged:
        warnings.warn(
            f"personalized_pagerank: tol={tol} not reached within "
            f"max_iter={max_iter} rounds; returning the best iterate",
            stacklevel=2,
        )
    out = ranks.select("node", "out_degree", "trust")
    return (out, rounds) if return_iters else out
