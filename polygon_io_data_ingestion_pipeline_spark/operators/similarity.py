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
"""

from __future__ import annotations

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
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qvec"))
    cand = df.filter(F.col(id_col) != query_id)
    scored = cand.join(F.broadcast(q)).select(
        F.col(id_col),
        cosine(vec_col, "__qvec").alias("__cos"),
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


def _plane_component(plane: int, dim: int) -> str:
    """Deterministic pseudo-random plane component in [-1, 1): derived
    from md5 so it is engine-portable (same planes in the SQL oracle)."""
    return (
        f"(CAST(conv(substr(md5('{plane}_' || CAST({dim} AS STRING)), 1, 4), 16, 10) AS DOUBLE)"
        f" / 32768.0 - 1.0)"
    )


def rp_lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) per vector."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.expr(
            f"aggregate(zip_with({vec_col}, transform(sequence(0, size({vec_col}) - 1),"
            f" d -> {_plane_component(p, 'd')}),"
            f" (x, r) -> CAST(x AS DOUBLE) * r), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col), sig.alias("bucket"))


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
    entries = []
    for t in range(n_tables):
        sig = F.lit(0).cast("long")
        for p in range(n_planes):
            gp = t * n_planes + p
            proj = F.expr(
                f"aggregate(zip_with({vec_col}, transform(sequence(0, size({vec_col}) - 1),"
                f" d -> {_plane_component(gp, 'd')}),"
                f" (x, r) -> CAST(x AS DOUBLE) * r), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            sig = sig + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        entries.append(F.struct(F.lit(t).alias("tbl"), sig.alias("bucket")))
    return df.select(F.col(id_col), F.explode(F.array(*entries)).alias("e")).select(
        id_col, F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket")
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
    e1 = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("e1"))
    e2 = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("e2"))
    return (
        cand.join(e1, "id1")
        .join(e2, "id2")
        .withColumn("__cos", cosine("e1", "e2"))
        .filter(F.col("__cos") >= threshold)
        .select("id1", "id2", F.round("__cos", 6).alias("cos"))
    )
