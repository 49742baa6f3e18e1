"""Similarity search over embedding columns (array<float>).

- :func:`cosine` — pure column expression (zip_with + aggregate), all
  JVM-side in double precision.
- :func:`brute_force_topk` — exact baseline: broadcast the query vector,
  map-side score, global top-k. Linear scan; the right answer at any
  scale when k is small and the corpus is scanned once.
- :func:`cosine_pairs` — exact all-pairs above a threshold (quadratic;
  oracle/baseline only).
- :func:`rp_lsh_buckets` / :func:`rp_lsh_candidate_pairs` — random
  hyperplane (sign) LSH: deterministic planes derived from md5 so the
  same buckets are reproducible in any engine; candidate generation is
  a hash join on bucket keys — the scale path for pairwise similarity.
- :func:`ivf_assign` / :func:`ivf_topk` / :func:`write_ivf_index` —
  IVF-flat ANN: a small broadcast codebook partitions the corpus into
  inverted lists; a query scans only its ``nprobe`` most promising
  lists. With the index materialized (``write_ivf_index``) the probe
  set prunes at the *directory* level, so a 100 TB corpus reads
  nprobe/nlist of its bytes per query.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — deterministic summation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours of the row with ``id_col == query_id``.

    The 1-row query side is broadcast; scoring is map-side over the
    corpus scan, then a global top-k (TakeOrdered — no full sort).
    """
    # The query's double cast and norm are constants: compute them on
    # the 1-row side BEFORE the broadcast instead of per corpus row
    # (same fold expression -> bit-identical cosines).
    q = df.filter(F.col(id_col) == query_id).select(
        _as_double(F.col(vec_col)).alias("__qvec")
    )
    q = q.select("__qvec", norm(F.col("__qvec")).alias("__qn"))
    cand = df.filter(F.col(id_col) != query_id).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__cvec")
    )
    scored = cand.join(F.broadcast(q)).select(
        F.col(id_col),
        (
            dot(F.col("__cvec"), F.col("__qvec"))
            / (norm(F.col("__cvec")) * F.col("__qn"))
        ).alias("__cos"),
    )
    return (
        scored.orderBy(F.desc("__cos"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__cos", 6).alias("cos"))
    )


def brute_force_topk_arrow(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same semantics as :func:`brute_force_topk`, scored by a
    vectorized Pandas UDF (one NumPy matrix-vector product per Arrow
    batch) instead of per-row higher-order functions — the higher-order
    expressions run interpreted per element, while this path is one
    BLAS call per batch. Results match the expression version (same
    doubles, same rounding) — asserted in tests."""
    # bounded: exact-match filter on the query id — at most a handful of rows
    q_rows = df.filter(F.col(id_col) == query_id).select(vec_col).collect()
    if not q_rows:
        raise ValueError(f"query id {query_id} not found")
    q = np.asarray(q_rows[0][0], dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    bq = df.sparkSession.sparkContext.broadcast(q)

    # type-hinted scalar pandas_udf (PEP 563 strings resolve against the
    # module globals, so pd must be a module-level import)
    @F.pandas_udf("double")
    def score(vecs: pd.Series) -> pd.Series:
        m = np.asarray(list(vecs), dtype=np.float64)
        dots = m @ bq.value
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return (
        df.filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.round(score(F.col(vec_col)), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (id1 < id2). Quadratic."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("e1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("e2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("__cos", cosine("e1", "e2"))
        .filter(F.col("__cos") >= threshold)
        .select("id1", "id2", F.round("__cos", 6).alias("cos"))
    )


def _plane_value(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1): first 4
    md5 hex chars of ``"<plane>_<dim>"`` as an int, scaled. Identical to
    the SQL oracles' ``conv(substr(md5(...), 1, 4), 16, 10)/32768 - 1``
    — engine-portable, and computable driver-side so the plan carries
    plane LITERALS instead of re-deriving md5 per row x plane x dim
    (the expression form ran interpreted inside higher-order lambdas:
    measured 33 s -> 1.5 s for the sf0.1 neardup pair generation)."""
    import hashlib

    return int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[:4], 16) / 32768.0 - 1.0


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality, probed from one non-null row (LIMIT 1
    scan — O(1) work at any corpus size).

    Null embeddings are skipped in the probe (a null first row would
    make the old ``first()`` raise), and all LSH callers require the
    surviving vectors to share this dimensionality: shorter/ragged rows
    would zip against a fixed-dim plane literal and null-propagate into
    their buckets instead of erroring."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    return int(row["d"]) if row is not None and row["d"] is not None else 0


def _bucket_expr(vec_col: str, planes: list[int], dim: int) -> str:
    """Sign-LSH bucket id as ONE compact SQL expression: the plane
    matrix is a constant ``array<array<double>>`` literal, projections
    are a per-plane zip_with/aggregate fold (left-to-right — same float
    association as DuckDB's replay), and the bucket packs projection
    signs into bits.

    Why a literal + single expression: deriving plane components
    per-row (md5 in a lambda) or unrolling per-dimension Column
    arithmetic both blow up — the former does rows x planes x dims
    hash calls at execute time, the latter builds a ~40k-node
    expression tree that costs ~13 s of driver/py4j time and seconds
    of Catalyst analysis per join branch. A constant literal keeps the
    tree tiny and the per-row work a pure multiply-add loop."""
    mat = ",".join(
        "array(" + ",".join(repr(_plane_value(p, d)) for d in range(dim)) + ")" for p in planes
    )
    return (
        f"aggregate(zip_with("
        f"  transform(array({mat}), pl -> "
        f"    aggregate(zip_with({vec_col}, pl, (x, r) -> CAST(x AS DOUBLE) * r),"
        f"              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)),"
        f"  sequence(0, {len(planes) - 1}),"
        f"  (pj, i) -> IF(pj >= 0, shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)),"
        f"             CAST(0 AS BIGINT))),"
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def rp_lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) per vector."""
    dim = _vec_dim(df, vec_col)
    return df.select(
        F.col(id_col), F.expr(_bucket_expr(vec_col, list(range(n_planes)), dim)).alias("bucket")
    )


def rp_lsh_candidate_pairs(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate near-neighbour pairs = same LSH bucket (hash join)."""
    b = rp_lsh_buckets(df, n_planes, id_col, vec_col)
    x = b.select(F.col(id_col).alias("id1"), "bucket")
    y = b.select(F.col(id_col).alias("id2"), "bucket")
    return x.join(y, "bucket").filter(F.col("id1") < F.col("id2")).select("id1", "id2", "bucket")


def rp_lsh_entries(
    df: DataFrame,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH: (id, tbl, bucket) rows, one bucket per hash
    table; table ``t`` uses global planes ``t*n_planes .. (t+1)*n_planes-1``.

    Multiple independent tables are the recall lever: a true near pair
    missed by one table's bucket is caught by another — the standard
    multi-probe/banding trade (like MinHash-LSH bands)."""
    dim = _vec_dim(df, vec_col)
    entries = []
    for t in range(n_tables):
        planes = [t * n_planes + p for p in range(n_planes)]
        sig = F.expr(_bucket_expr(vec_col, planes, dim))
        entries.append(F.struct(F.lit(t).alias("tbl"), sig.alias("bucket")))
    return df.select(F.col(id_col), F.explode(F.array(*entries)).alias("e")).select(
        id_col, F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket")
    )


# ---------------------------------------------------------------------------
# IVF-flat ANN
# ---------------------------------------------------------------------------


def strided_centroids(
    df: DataFrame,
    nlist: int = 16,
    stride: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse-quantizer codebook: the corpus vectors at
    ids ``0, stride, ..., (nlist-1)*stride``, as ``(cid, vector)``.

    A fixed stride keeps the codebook reproducible in the SQL oracle;
    production training swaps in :func:`kmeans_centroids` — the IVF
    structure (assign, probe, prune) is identical either way."""
    rows = (
        # bounded: the filter admits at most nlist ids
        df.filter((F.col(id_col) % stride == 0) & (F.col(id_col) < nlist * stride))
        .select((F.col(id_col) / stride).cast("int").alias("cid"), vec_col)
        .collect()
    )
    out = sorted((int(r["cid"]), [float(v) for v in r[vec_col]]) for r in rows)
    if len(out) < nlist:
        raise ValueError(f"corpus has no vector at some of the {nlist} strided ids")
    return out


def _bounded_train_sample(
    df: DataFrame, vec_col: str, max_train_rows: int, seed: int
) -> "np.ndarray":
    """Collect AT MOST ``max_train_rows`` vectors to the driver for
    codebook training.

    The cap is absolute: one cheap ``count()`` sizes the corpus, then a
    seeded Bernoulli sample targets ~1.25x the cap and a seeded random
    shuffle BEFORE the ``limit`` enforces the hard bound without
    partition-order bias — a bare ``limit`` takes a partition-order
    prefix, which would systematically drop later partitions whenever
    the Bernoulli sample overshoots the cap (the expected case), biasing
    codebooks when data is partition-ordered by source or time.  The
    ``orderBy(rand)`` runs on the ~1.25x-cap sampled frame, not the
    corpus, so it is cheap.  Driver memory is O(max_train_rows x dim)
    regardless of corpus size — the FAISS training recipe (~256 x nlist
    points is plenty for Lloyd convergence)."""
    if max_train_rows < 1:
        raise ValueError("max_train_rows must be >= 1")
    n = df.count()
    src = df.select(vec_col)
    if n > max_train_rows:
        frac = min(1.0, (max_train_rows * 1.25) / n)
        src = (
            src.sample(fraction=frac, seed=seed)
            .orderBy(F.rand(seed))
            .limit(max_train_rows)
        )
    return np.asarray([r[0] for r in src.collect()], dtype=np.float64)


def kmeans_centroids(
    df: DataFrame,
    nlist: int = 16,
    iters: int = 5,
    max_train_rows: int = 65536,
    seed: int = 7,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Lloyd k-means codebook trained on a driver-side sample.

    This is how production IVF codebooks are built (FAISS-style: train
    on a sample capped at ``max_train_rows`` regardless of corpus size —
    the cap, not the corpus, bounds driver memory — then assign
    distributed). Deterministic for a given seed. Cosine assignment,
    mean update."""
    sample = _bounded_train_sample(df, vec_col, max_train_rows, seed)
    if len(sample) < nlist:
        raise ValueError(f"sample of {len(sample)} rows cannot seed {nlist} centroids")
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=nlist, replace=False)].copy()
    sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = (sn @ cn.T).argmax(axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [(c, [float(v) for v in cents[c]]) for c in range(nlist)]


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _centroid_scores(vec_col: str, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<cos, cid>>: this row's cosine against every codebook
    entry. The codebook rides in the plan as literals (it is tiny —
    nlist x dim doubles), so scoring is map-only: no join, no shuffle."""
    vd = _as_double(F.col(vec_col))
    vn = norm(vd)
    entries = []
    for cid, cvec in centroids:
        cl = _lit_vec(cvec)
        entries.append(
            F.struct((dot(vd, cl) / (vn * norm(cl))).alias("cos"), F.lit(int(cid)).alias("cid"))
        )
    return F.array(*entries)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``list_id``: the nearest-centroid inverted list, argmax
    cosine over the codebook (ties -> highest cid; the SQL-oracle
    equivalent is ``ORDER BY cos DESC, cid DESC``). Map-only."""
    best = F.array_max(_centroid_scores(vec_col, centroids))
    return df.withColumn("list_id", best["cid"])


def _probe_lists(scores: Column, nprobe: int) -> Column:
    """cids of the ``nprobe`` best-scoring centroids, best first."""
    return F.transform(
        F.slice(F.reverse(F.array_sort(scores)), 1, nprobe), lambda s: s["cid"]
    )


def ivf_topk(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_id: int,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: exact cosine, but only over the
    ``nprobe`` inverted lists nearest the query (work ~ nprobe/nlist of
    a brute-force scan; ``nprobe = nlist`` degrades gracefully to exact
    brute force). Candidate selection is a broadcast hash join of the
    1-row query's probe set — no shuffle of the corpus."""
    scores = _centroid_scores(vec_col, centroids)
    assigned = ivf_assign(df, centroids, vec_col).filter(F.col(id_col) != query_id)
    probes = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qvec"),
        F.explode(_probe_lists(scores, nprobe)).alias("list_id"),
    )
    scored = assigned.join(F.broadcast(probes), "list_id").select(
        F.col(id_col), cosine(vec_col, "__qvec").alias("__cos")
    )
    return (
        scored.orderBy(F.desc("__cos"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__cos", 6).alias("cos"))
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: the corpus written partitioned by
    ``list_id``. Probing then prunes whole directories — a query reads
    nprobe/nlist of the corpus bytes (PartitionFilters in the scan
    plan; asserted in tests)."""
    (
        ivf_assign(df, centroids, vec_col)
        .repartition("list_id")
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(path)
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    nlist: int = 16,
    stride: int = 31,
    centroids: list[tuple[int, list[float]]] | None = None,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Explicit index-build step: materialize the IVF index at a LAKE
    path together with its codebook (``_codebook.json`` sidecar (underscore-prefixed so the parquet scan ignores it)), so the
    index is a self-contained artifact any session can probe without
    recomputing centroids — the cluster-correct replacement for caching
    in a driver-local tmp dir. Returns the codebook used."""
    import json

    if centroids is None:
        centroids = strided_centroids(df, nlist=nlist, stride=stride, vec_col=vec_col)
    write_ivf_index(df, path, centroids, vec_col)
    with open(os.path.join(path, "_codebook.json"), "w") as fh:
        json.dump([[cid, vec] for cid, vec in centroids], fh)
    return centroids


def _ivf_lock_path(path: str) -> str:
    """Sibling lease-lock path for a materialized index: OUTSIDE the
    index directory (rebalance swaps the directory itself, which would
    take an in-dir lock with it), underscore-prefixed so a scan of the
    parent ignores it."""
    trimmed = path.rstrip("/")
    head, tail = os.path.split(trimmed)
    return os.path.join(head or ".", f"_{tail}.maintenance.lock")


def _stream_batch_dirs(path: str) -> list[str]:
    """``ingest_batch=*`` partition dirs of a STREAMING-built index
    (:mod:`..streaming.corpus_stream` writes ``ingest_batch=<id>/
    list_id=<l>/`` so replays can overwrite one batch dir atomically);
    empty for a batch-built index (top-level ``list_id=*``).  An index
    must hold exactly ONE of the two depths — Spark's partition
    discovery rejects a mix — so every lifecycle op routes on this."""
    import glob as _glob

    return sorted(_glob.glob(os.path.join(path, "ingest_batch=*")))


def _append_target(path: str) -> str:
    """Where an append may write: a stream-layout index keeps its
    two-level depth (a fresh ``ingest_batch=append-*`` dir), a
    batch-layout index appends into its top-level list dirs."""
    import uuid as _uuid

    if _stream_batch_dirs(path):
        return os.path.join(path, f"ingest_batch=append-{_uuid.uuid4().hex[:8]}")
    return path


def _restage_streamwise(path: str, staging: str) -> None:
    """Make a rebalance staging dir (always built batch-layout) match a
    stream-layout live index before the swap: move its list dirs under
    one ``ingest_batch=rebuild-*`` level and CARRY THE STREAMING LEDGER
    over — otherwise the swap would (a) flip the index to the other
    partition depth, breaking the next streaming batch's read, and
    (b) delete ``_indexed_batches.json``, so a checkpoint replay would
    re-index batches whose rows the rebuild already consolidated
    (duplicate vectors in the index)."""
    import glob as _glob
    import shutil
    import uuid as _uuid

    if not _stream_batch_dirs(path):
        return
    sub = os.path.join(staging, f"ingest_batch=rebuild-{_uuid.uuid4().hex[:8]}")
    os.makedirs(sub)
    for d in _glob.glob(os.path.join(staging, "list_id=*")):
        shutil.move(d, os.path.join(sub, os.path.basename(d)))
    ledger = os.path.join(path, "_indexed_batches.json")
    if os.path.exists(ledger):
        shutil.copy2(ledger, os.path.join(staging, "_indexed_batches.json"))


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign NEW vectors to the
    EXISTING codebook and append them into the index's partition
    directories — no rebuild, no touch of resident data.

    This is how a growing corpus keeps its ANN index fresh at 100 TB:
    rebuilding reclusters everything (quadratic over time); appending
    is one map-side assignment against the frozen centroid literals
    plus a partitioned append of only the new rows. The recall
    trade-off is honest and standard (FAISS `add` does the same):
    frozen centroids drift from the true clustering as the
    distribution shifts, so periodically re-train and rebuild; until
    then every appended vector is still reachable through its nearest
    frozen centroid, and `ivf_topk_indexed` probes appended rows with
    zero changes. Daily small-file buildup is `compact_lake`'s job.
    """
    from ..sources.lease import LakeLease

    spark = df.sparkSession
    with LakeLease(spark, path, holder="ivf_append", lock_path=_ivf_lock_path(path)):
        centroids = read_ivf_codebook(path)
        (
            ivf_assign(df, centroids, vec_col)
            .repartition("list_id")
            .write.partitionBy("list_id")
            .mode("append")
            .parquet(_append_target(path))
        )


def read_ivf_codebook(path: str) -> list[tuple[int, list[float]]]:
    """Load the codebook sidecar written by :func:`build_ivf_index`."""
    import json

    with open(os.path.join(path, "_codebook.json")) as fh:
        return [(int(cid), [float(v) for v in vec]) for cid, vec in json.load(fh)]


def _index_nlist(path: str) -> int:
    """Coarse-list count of a materialized index, from whichever sidecar
    it carries (``_codebook.json`` for plain IVF, ``_ivfpq.json`` for
    IVF+PQ)."""
    import json

    pq_sidecar = os.path.join(path, "_ivfpq.json")
    if os.path.exists(pq_sidecar):
        with open(pq_sidecar) as fh:
            return len(json.load(fh)["centroids"])
    return len(read_ivf_codebook(path))


def ivf_index_imbalance(spark, path: str) -> dict:
    """Codebook-drift trigger metric for a materialized IVF index.

    Returns FAISS's imbalance factor ``nlist * sum(sz^2) / n^2`` (1.0 =
    perfectly even lists; probing cost and recall both degrade as it
    grows, because hot lists crowd the probe budget while starved lists
    strand their vectors behind unprobed centroids), plus the raw
    facts: total vectors, list count, largest list, and how many
    codebook entries have no vectors at all.  One partition-pruned
    count aggregate — O(nlist) driver memory.
    """
    sizes = {
        int(r["list_id"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    nlist = _index_nlist(path)
    n = sum(sizes.values())
    ss = sum(v * v for v in sizes.values())
    return {
        "n_vectors": n,
        "n_lists": nlist,
        "imbalance": (nlist * ss / (n * n)) if n else 1.0,
        "max_list": max(sizes.values(), default=0),
        "empty_lists": nlist - len(sizes),
    }


def rebalance_ivf_index(
    spark,
    path: str,
    nlist: int | None = None,
    iters: int = 5,
    max_train_rows: int = 65536,
    seed: int = 7,
    vec_col: str = "embedding",
    rebalance_above: float | None = None,
) -> dict:
    """Retrain the codebook on the CURRENT index contents and rebuild —
    the periodic maintenance :func:`append_to_ivf_index` defers.

    Appends keep the codebook frozen, so under distribution drift the
    lists skew: recall decays (new-regime vectors pile into few lists)
    and probe cost spikes (hot lists dominate every probe set).  The
    fix is the standard one: re-run Lloyd k-means over a bounded sample
    of what the index NOW holds, re-assign every vector map-side, and
    rewrite.  The rebuild streams through a staging directory next to
    the index, so no corpus-sized frame is ever materialized; a crash
    BEFORE the swap leaves the old index untouched, and a crash inside
    the delete-then-rename swap window leaves the COMPLETE new index at
    ``<path>__rebalance_staging`` (recovery = rename it into place — a
    plain filesystem has no atomic directory swap, so the window is
    documented rather than pretended away).  The whole operation holds
    the index's maintenance lease (a SIBLING lock file, surviving the
    swap) so appends cannot interleave with it.

    ``rebalance_above``: if set, first measure
    :func:`ivf_index_imbalance` and SKIP the rebuild when the factor is
    at or below the threshold (cheap no-op path for schedulers).
    Returns the imbalance measured before, whether a rebuild ran, and
    the imbalance after.
    """
    from ..sources.lease import LakeLease

    before = ivf_index_imbalance(spark, path)
    if rebalance_above is not None and before["imbalance"] <= rebalance_above:
        return {"before": before, "rebuilt": False, "after": before}
    with LakeLease(spark, path, holder="ivf_rebalance", lock_path=_ivf_lock_path(path)):
        old_cb = read_ivf_codebook(path)
        if nlist is None:
            nlist = len(old_cb)
        vecs = spark.read.parquet(path).drop("list_id", "ingest_batch")
        cents = kmeans_centroids(
            vecs,
            nlist=nlist,
            iters=iters,
            max_train_rows=max_train_rows,
            seed=seed,
            vec_col=vec_col,
        )
        staging = path.rstrip("/") + "__rebalance_staging"
        write_ivf_index(vecs, staging, cents, vec_col)
        import json

        with open(os.path.join(staging, "_codebook.json"), "w") as fh:
            json.dump([[cid, vec] for cid, vec in cents], fh)
        _restage_streamwise(path, staging)
        jvm = spark._jvm
        jsrc = jvm.org.apache.hadoop.fs.Path(staging)
        jdst = jvm.org.apache.hadoop.fs.Path(path)
        fs = jdst.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jdst, True)
        fs.rename(jsrc, jdst)
        spark.catalog.refreshByPath(path)
    return {"before": before, "rebuilt": True, "after": ivf_index_imbalance(spark, path)}


def ivf_topk_indexed(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    schema=None,
) -> DataFrame:
    """Top-k against a materialized IVF index (:func:`write_ivf_index`).

    The probe set is ranked driver-side (nlist dot products on one
    vector), so the ``list_id IN (...)`` filter is a literal predicate
    and partition pruning skips every unprobed list's files.  Pass the
    index's known ``schema`` to skip per-probe parquet footer
    inference — an ANN service holds its index metadata in memory; on a
    wide index the inference job costs more driver time than the probe
    itself executes."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def cscore(cvec: list[float]) -> float:
        c = np.asarray(cvec, dtype=np.float64)
        return float(q @ c) / (qn * float(np.sqrt((c * c).sum())))

    ranked = sorted(((cscore(cv), cid) for cid, cv in centroids), reverse=True)
    probed = [cid for _, cid in ranked[:nprobe]]

    reader = spark.read.schema(schema) if schema is not None else spark.read
    idx = reader.parquet(path).filter(F.col("list_id").isin(probed))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    scored = idx.select(F.col(id_col), cosine(vec_col, _lit_vec(list(q))).alias("__cos"))
    return (
        scored.orderBy(F.desc("__cos"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__cos", 6).alias("cos"))
    )


def cosine_neardup_lsh(
    df: DataFrame,
    threshold: float = 0.3,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production near-dup path: multi-table random-hyperplane LSH
    candidate generation (hash join on (table, bucket) — shuffle linear
    in the corpus), then **exact** cosine verification of candidates
    only. Mirrors the MinHash route in dedup.py
    (``lsh_candidate_pairs`` -> exact-Jaccard verify); the quadratic
    :func:`cosine_pairs` stays as the recall baseline/test oracle.
    """
    entries = rp_lsh_entries(df, n_planes, n_tables, id_col, vec_col)
    x = entries.select(F.col(id_col).alias("id1"), "tbl", "bucket")
    y = entries.select(F.col(id_col).alias("id2"), "tbl", "bucket")
    cand = (
        x.join(y, ["tbl", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    # Cast-to-double and the norm are per-VECTOR quantities: compute
    # them once map-side before the candidate join instead of per pair
    # (a bucket-degree-D vector would otherwise redo them D times).
    # cos = dot/(n1*n2) is the literally identical float expression the
    # inline form produced, so oracle parity is unaffected.
    ed = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("ev"),
    ).select(id_col, "ev", norm(F.col("ev")).alias("nv"))
    e1 = ed.select(F.col(id_col).alias("id1"), F.col("ev").alias("e1"), F.col("nv").alias("n1"))
    e2 = ed.select(F.col(id_col).alias("id2"), F.col("ev").alias("e2"), F.col("nv").alias("n2"))
    return (
        cand.join(e1, "id1")
        .join(e2, "id2")
        .withColumn("__cos", dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2")))
        .filter(F.col("__cos") >= threshold)
        .select("id1", "id2", F.round("__cos", 6).alias("cos"))
    )


def knn_join_lsh(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN JOIN: for EVERY vector, its k most-cosine-similar
    neighbours among its multi-table LSH candidates — the batch kNN
    graph that semantic dedup, clustering and retrieval-index builds
    consume (vs :func:`brute_force_topk`, which answers one query).

    Scale shape: candidates come from the same (table, bucket) equi
    hash join as :func:`cosine_neardup_lsh` (shuffle linear in the
    corpus, never all-pairs); exact cosines verify candidates only,
    with per-vector casts/norms computed once map-side; the top-k is a
    rank window per query id — no global sort. Recall is tuned with
    n_tables/n_planes exactly like the near-dup path; the floor is
    asserted against an exact numpy kNN oracle in
    tests/test_knn_join_recall.py (~0.98 recall@5 at 3 planes x 16
    tables on the driver testdata; emitted cosines always exact).

    Returns (id, neighbor_id, rank, cos), rank 1..k, ties broken by
    neighbor id.
    """
    from pyspark.sql import Window as W

    entries = rp_lsh_entries(df, n_planes, n_tables, id_col, vec_col)
    q = entries.select(F.col(id_col).alias("qid"), "tbl", "bucket")
    nb = entries.select(F.col(id_col).alias("nid"), "tbl", "bucket")
    cand = (
        q.join(nb, ["tbl", "bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    ed = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("ev")).select(
        id_col, "ev", norm(F.col("ev")).alias("nv")
    )
    e1 = ed.select(F.col(id_col).alias("qid"), F.col("ev").alias("e1"), F.col("nv").alias("n1"))
    e2 = ed.select(F.col(id_col).alias("nid"), F.col("ev").alias("e2"), F.col("nv").alias("n2"))
    scored = (
        cand.join(e1, "qid")
        .join(e2, "nid")
        .withColumn(
            "cos", F.round(dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2")), 6)
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(id_col),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            "cos",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC)
# ---------------------------------------------------------------------------


def pq_codebooks_strided(
    df: DataFrame,
    m: int = 4,
    ncodes: int = 16,
    stride: int = 31,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace PQ codebooks from the strided corpus vectors'
    slices: subspace ``s`` of a ``d``-dim corpus gets the ``ncodes``
    strided vectors' dims ``[s*d/m, (s+1)*d/m)`` as its codes.

    Deterministic (SQL-oracle reproducible), like
    :func:`strided_centroids`; production training swaps in
    :func:`pq_codebooks_kmeans` — encode/ADC are identical either way.
    """
    full = strided_centroids(df, nlist=ncodes, stride=stride, id_col=id_col, vec_col=vec_col)
    dim = len(full[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    w = dim // m
    return [[(cid, vec[s * w : (s + 1) * w]) for cid, vec in full] for s in range(m)]


def pq_codebooks_kmeans(
    df: DataFrame,
    m: int = 4,
    ncodes: int = 16,
    iters: int = 5,
    max_train_rows: int = 65536,
    seed: int = 7,
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Production PQ training: independent Lloyd k-means (L2) per
    subspace on a driver-side sample — the FAISS recipe. The sample is
    capped at ``max_train_rows`` (absolute, not a fraction), so driver
    memory is bounded regardless of corpus size; encoding stays
    distributed."""
    sample = _bounded_train_sample(df, vec_col, max_train_rows, seed)
    if len(sample) < ncodes:
        raise ValueError(f"sample of {len(sample)} rows cannot seed {ncodes} codes")
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    w = dim // m
    rng = np.random.default_rng(seed)
    books: list[list[tuple[int, list[float]]]] = []
    for s in range(m):
        sub = sample[:, s * w : (s + 1) * w]
        cents = sub[rng.choice(len(sub), size=ncodes, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ncodes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([(c, [float(v) for v in cents[c]]) for c in range(ncodes)])
    return books


def _pq_codes(vec_col: str, codebooks: list[list[tuple[int, list[float]]]]) -> Column:
    """array<int>: per-subspace nearest code by squared L2 (ties ->
    lowest code; the SQL-oracle equivalent is ``ORDER BY d2, cid``).
    Codebooks ride in the plan as ONE nested array literal inside one
    compact ``F.expr`` — the `_bucket_expr` discipline. The obvious
    alternative (m x ncodes separate aggregate/zip_with Column objects)
    builds a ~256-branch expression tree that costs ~9 s of driver/py4j
    and Catalyst-analysis time PER CALL before a single row is scanned;
    the literal keeps plan construction milliseconds and the per-row
    work identical."""
    w = len(codebooks[0][0][1])
    m = len(codebooks)
    cb = "array(" + ",".join(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) for v in cvec) + ")" for _cid, cvec in book
        )
        + ")"
        for book in codebooks
    ) + ")"
    cids = "array(" + ",".join(
        "array(" + ",".join(str(int(cid)) for cid, _ in book) + ")" for book in codebooks
    ) + ")"
    return F.expr(
        f"transform(sequence(0, {m - 1}), s -> "
        f"  array_min(zip_with("
        f"    element_at({cb}, s + 1),"
        f"    element_at({cids}, s + 1),"
        f"    (cv, cid) -> named_struct("
        f"      'd2', aggregate(zip_with(slice({vec_col}, s * {w} + 1, {w}), cv,"
        f"              (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),"
        f"            CAST(0.0 AS DOUBLE), (acc, x) -> acc + x),"
        f"      'cid', cid)"
        f"  )).cid)"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): the compressed corpus representation —
    m small ints instead of d floats (64x for d=64 float32 / m=4).
    At 100 TB this is the table you persist: ADC queries scan codes
    only and never touch the raw vectors."""
    return df.select(F.col(id_col), _pq_codes(vec_col, codebooks).alias("codes"))


def _fold_dot(a: list[float], b: list[float]) -> float:
    # left-associative fold, bit-identical to list_sum/F.aggregate
    # in the engines (np.dot's BLAS summation order is not)
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _adc_score(
    query_vec: list[float], codebooks: list[list[tuple[int, list[float]]]]
) -> Column:
    """ADC cosine score over a ``codes`` column for one query vector:
    ``sum_s lut_dot[s][code_s] / (|q| * sqrt(sum_s lut_n2[s][code_s]))``
    with fixed left-to-right summation order (oracle-reproducible); the
    per-subspace lookup tables ride in the plan as literals."""
    w = len(codebooks[0][0][1])
    qnorm = float(np.sqrt(_fold_dot(query_vec, query_vec)))
    lut_dot = [
        [_fold_dot(query_vec[s * w : (s + 1) * w], cvec) for _cid, cvec in book]
        for s, book in enumerate(codebooks)
    ]
    lut_n2 = [[_fold_dot(cvec, cvec) for _cid, cvec in book] for book in codebooks]

    # One compact expr per table (the `_bucket_expr` discipline, see
    # _pq_codes): zip the codes array against the per-subspace lookup
    # rows and fold left-to-right — the same ascending-s summation
    # order as the unrolled form, so oracles replay bit-for-bit.
    def _lut2(rows: list[list[float]]) -> str:
        return (
            "array("
            + ",".join(
                "array(" + ",".join(repr(float(x)) for x in row) + ")" for row in rows
            )
            + ")"
        )

    dot_expr = F.expr(
        f"aggregate(zip_with(codes, {_lut2(lut_dot)},"
        f"  (c, tbl) -> element_at(tbl, c + 1)),"
        f"  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    n2_expr = F.expr(
        f"aggregate(zip_with(codes, {_lut2(lut_n2)},"
        f"  (c, tbl) -> element_at(tbl, c + 1)),"
        f"  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return dot_expr / (F.lit(qnorm) * F.sqrt(n2_expr))


def pq_topk(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """PQ/ADC approximate top-k cosine: look up each subspace's
    query-to-code dot product and code norm in tiny per-query tables
    (computed driver-side from the codebook), then score each corpus
    row from its codes alone — no per-row vector math at query time
    (:func:`_adc_score`). Pass a pre-encoded ``codes_df``
    (:func:`pq_encode` output) to skip in-plan encoding — the
    production shape, where codes are a materialized table.
    """
    qvec = [
        float(v) for v in df.filter(F.col(id_col) == query_id).select(vec_col).first()[0]
    ]
    encoded = codes_df if codes_df is not None else pq_encode(df, codebooks, id_col, vec_col)
    score = _adc_score(qvec, codebooks)
    return (
        encoded.filter(F.col(id_col) != query_id)
        .select(F.col(id_col), score.alias("__adc"))
        .orderBy(F.desc("__adc"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__adc", 6).alias("adc_cos"))
    )


def pq_topk_rerank(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    query_id: int,
    k: int = 10,
    refine: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """Production PQ shape: ADC shortlist of ``k * refine`` candidates
    from the compressed codes, then EXACT cosine re-rank of only those
    rows. At 100 TB the ADC pass scans the m-byte codes table and the
    re-rank fetches ``k * refine`` raw vectors by id — the corpus's
    float data is never scanned. Recall approaches exact as ``refine``
    grows; compression stays m bytes/vector at rest.
    """
    shortlist = pq_topk(
        df, codebooks, query_id, k=k * refine, id_col=id_col, vec_col=vec_col, codes_df=codes_df
    ).select(id_col)
    qv = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qvec"))
    exact = (
        shortlist.join(df.select(id_col, vec_col), id_col)
        .crossJoin(F.broadcast(qv))
        .select(F.col(id_col), cosine(vec_col, "__qvec").alias("__cos"))
    )
    return (
        exact.orderBy(F.desc("__cos"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__cos", 6).alias("cos"))
    )


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 4,
    ncodes: int = 16,
    stride: int = 31,
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]]:
    """Materialize the combined IVF+PQ index — the FAISS ``IVFPQ``
    shape, composed from this module's two halves: the corpus written
    partitioned by inverted list (directory pruning per probe) with
    each row carrying BOTH its PQ ``codes`` (the columns an ADC scan
    reads) and its raw vector (fetched only for the re-rank shortlist;
    column pruning keeps it unread during the ADC pass). Coarse
    centroids and per-subspace codebooks ship in a ``_ivfpq.json``
    sidecar, so the index is a self-contained lake artifact."""
    import json

    if centroids is None:
        centroids = strided_centroids(df, nlist=nlist, stride=stride, id_col=id_col, vec_col=vec_col)
    if codebooks is None:
        codebooks = pq_codebooks_strided(df, m=m, ncodes=ncodes, stride=stride, id_col=id_col, vec_col=vec_col)
    (
        ivf_assign(df, centroids, vec_col)
        .withColumn("codes", _pq_codes(vec_col, codebooks))
        .repartition("list_id")
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivfpq.json"), "w") as fh:
        json.dump(
            {
                "centroids": [[cid, vec] for cid, vec in centroids],
                "codebooks": [[[cid, vec] for cid, vec in book] for book in codebooks],
            },
            fh,
        )
    return centroids, codebooks


def append_to_ivfpq_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF+PQ maintenance: encode NEW vectors against the
    FROZEN coarse centroids and PQ codebooks from the index's sidecar
    and append them into its list partitions — no rebuild, no touch of
    resident data.  The compressed-index twin of
    :func:`append_to_ivf_index` (FAISS ``IVFPQ.add``): a streaming-fed
    compressed index never needs a full rebuild just to grow.  Frozen
    codebooks drift under distribution shift exactly as in the plain
    IVF case — :func:`ivf_index_imbalance` is the trigger metric and
    :func:`rebalance_ivfpq_index` the repair; until then every appended
    vector is reachable through its nearest frozen centroid and scored
    from its codes by :func:`ivfpq_topk_rerank` with zero changes.
    Runs under the index's maintenance lease (sibling lock, so a
    concurrent rebalance cannot interleave)."""
    from ..sources.lease import LakeLease

    spark = df.sparkSession
    with LakeLease(spark, path, holder="ivfpq_append", lock_path=_ivf_lock_path(path)):
        cents, books = read_ivfpq_meta(path)
        (
            ivf_assign(df, cents, vec_col)
            .withColumn("codes", _pq_codes(vec_col, books))
            .repartition("list_id")
            .write.partitionBy("list_id")
            .mode("append")
            .parquet(_append_target(path))
        )


def rebalance_ivfpq_index(
    spark,
    path: str,
    nlist: int | None = None,
    m: int | None = None,
    ncodes: int | None = None,
    iters: int = 5,
    max_train_rows: int = 65536,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebalance_above: float | None = None,
) -> dict:
    """Retrain BOTH codebook levels (coarse k-means + per-subspace PQ)
    on a hard-capped sample of what the index NOW holds, re-encode
    every resident vector map-side, and swap via the staged-rename
    recipe of :func:`rebalance_ivf_index` — all under the index's
    maintenance lease (sibling lock file, surviving the directory
    swap).  ``rebalance_above`` short-circuits on
    :func:`ivf_index_imbalance` for schedulers.  Raw vectors ride in
    the index rows precisely so this retrain never needs the source
    corpus."""
    from ..sources.lease import LakeLease

    before = ivf_index_imbalance(spark, path)
    if rebalance_above is not None and before["imbalance"] <= rebalance_above:
        return {"before": before, "rebuilt": False, "after": before}
    with LakeLease(spark, path, holder="ivfpq_rebalance", lock_path=_ivf_lock_path(path)):
        old_cents, old_books = read_ivfpq_meta(path)
        nlist = nlist or len(old_cents)
        m = m or len(old_books)
        ncodes = ncodes or len(old_books[0])
        vecs = spark.read.parquet(path).drop("list_id", "codes", "ingest_batch")
        cents = kmeans_centroids(
            vecs, nlist=nlist, iters=iters, max_train_rows=max_train_rows,
            seed=seed, vec_col=vec_col,
        )
        books = pq_codebooks_kmeans(
            vecs, m=m, ncodes=ncodes, iters=iters, max_train_rows=max_train_rows,
            seed=seed, vec_col=vec_col,
        )
        staging = path.rstrip("/") + "__rebalance_staging"
        build_ivfpq_index(
            vecs, staging, centroids=cents, codebooks=books,
            id_col=id_col, vec_col=vec_col,
        )
        _restage_streamwise(path, staging)
        jvm = spark._jvm
        jsrc = jvm.org.apache.hadoop.fs.Path(staging)
        jdst = jvm.org.apache.hadoop.fs.Path(path)
        fs = jdst.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jdst, True)
        fs.rename(jsrc, jdst)
        spark.catalog.refreshByPath(path)
    return {"before": before, "rebuilt": True, "after": ivf_index_imbalance(spark, path)}


def read_ivfpq_meta(
    path: str,
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]]:
    """Load the (centroids, codebooks) sidecar from
    :func:`build_ivfpq_index`."""
    import json

    with open(os.path.join(path, "_ivfpq.json")) as fh:
        meta = json.load(fh)
    cents = [(int(cid), [float(v) for v in vec]) for cid, vec in meta["centroids"]]
    books = [
        [(int(cid), [float(v) for v in vec]) for cid, vec in book]
        for book in meta["codebooks"]
    ]
    return cents, books


def ivfpq_topk_rerank(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    schema=None,
) -> DataFrame:
    """Top-k against a materialized IVF+PQ index — the full 100 TB ANN
    read path, three prunings multiplied together:

    1. **partition pruning** (IVF): the probe set is ranked driver-side
       (nlist dot products), so only ``nprobe/nlist`` of the corpus
       directories are touched;
    2. **column pruning** (PQ/ADC): the shortlist pass selects only
       (id, codes) — m small ints per row, never the raw floats — and
       scores via the ADC lookup tables riding as plan literals;
    3. **row pruning** (re-rank): exact cosines are computed for the
       ``k * refine`` shortlist only, fetched back from the SAME
       partition-pruned index scan by id.

    A query therefore reads nprobe/nlist of the codes bytes plus
    k*refine raw vectors, independent of corpus size.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def cscore(cvec: list[float]) -> float:
        c = np.asarray(cvec, dtype=np.float64)
        return float(q @ c) / (qn * float(np.sqrt((c * c).sum())))

    ranked = sorted(((cscore(cv), cid) for cid, cv in centroids), reverse=True)
    probed = [cid for _, cid in ranked[:nprobe]]

    reader = spark.read.schema(schema) if schema is not None else spark.read
    idx = reader.parquet(path).filter(F.col("list_id").isin(probed))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    shortlist = (
        idx.select(F.col(id_col), _adc_score(list(map(float, q)), codebooks).alias("__adc"))
        .orderBy(F.desc("__adc"), F.col(id_col))
        .limit(k * refine)
        .select(id_col)
    )
    exact = shortlist.join(idx.select(id_col, vec_col), id_col).select(
        F.col(id_col), cosine(vec_col, _lit_vec(list(map(float, q)))).alias("__cos")
    )
    return (
        exact.orderBy(F.desc("__cos"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__cos", 6).alias("cos"))
    )


def semantic_decontam(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    bench_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding-space
    companion to ``dedup.contamination_overlap`` (shingle overlap):
    flag corpus documents whose embedding is within ``threshold``
    cosine of ANY benchmark item, catching paraphrased/reformatted
    benchmark leakage that exact and n-gram decontamination provably
    cannot see (no shared shingles, same meaning).

    Scale shape — the cross-corpus variant of
    :func:`cosine_neardup_lsh`: both sides hash into the SAME
    multi-table random-hyperplane buckets (the planes are md5-derived
    constants, so the two frames agree without any shared state),
    candidates come from a (table, bucket) hash equi-join — shuffle
    linear in corpus + benchmark, never |corpus| x |benchmark| — and
    only candidates pay the exact cosine.  Per flagged document the
    BEST benchmark match survives (highest cosine, ties to the lowest
    benchmark id; one partial-agg max-struct, no window).

    Returns ``(id_col, bench_id, cos)`` — one row per CONTAMINATED
    corpus document; anti-join the corpus against it to scrub."""
    ec = rp_lsh_entries(corpus, n_planes, n_tables, id_col, vec_col)
    eb = rp_lsh_entries(benchmark, n_planes, n_tables, bench_id_col, vec_col)
    cand = (
        ec.select(F.col(id_col).alias("__cid"), "tbl", "bucket")
        .join(
            eb.select(F.col(bench_id_col).alias("__bid"), "tbl", "bucket"),
            ["tbl", "bucket"],
        )
        .select("__cid", "__bid")
        .distinct()
    )
    cd = corpus.select(
        F.col(id_col).alias("__cid"), _as_double(F.col(vec_col)).alias("cv")
    ).select("__cid", "cv", norm(F.col("cv")).alias("cn"))
    bd = benchmark.select(
        F.col(bench_id_col).alias("__bid"), _as_double(F.col(vec_col)).alias("bv")
    ).select("__bid", "bv", norm(F.col("bv")).alias("bn"))
    scored = (
        cand.join(cd, "__cid")
        .join(bd, "__bid")
        .withColumn(
            "__cos",
            F.round(dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")), 6),
        )
        .filter(F.col("__cos") >= threshold)
    )
    best = scored.groupBy("__cid").agg(
        F.max(F.struct(F.col("__cos"), (-F.col("__bid")).alias("__nb"))).alias("b")
    )
    return best.select(
        F.col("__cid").alias(id_col),
        (-F.col("b.__nb")).alias("bench_id"),
        F.col("b.__cos").alias("cos"),
    )
