"""Deterministic corpus sampling / split assignment.

Training-data pipelines need reproducible, engine-portable randomness:
every row's fate (train/val/test membership, keep-or-drop under a
mixture weight) must be a pure function of its key, so re-runs,
backfills, and a DuckDB audit of the same parquet all agree. We derive
buckets from md5 of the key — the same construction the RP-LSH planes
use (similarity.py) — rather than ``rand()`` (non-reproducible across
partitionings) or ``hash()`` (engine-specific).

Everything here is a map-side column expression: no shuffle, no state,
no UDF — at 100 TB these run at scan speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key_col: str, salt: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex chars of
    ``salt || key`` as an int, mod n_buckets. Engine-portable (DuckDB:
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % n``)."""
    return F.expr(
        f"CAST(conv(substr(md5('{salt}' || CAST({key_col} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) % {n_buckets}"
    )


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column: 'train' / 'val' / 'test' by deterministic
    hash bucket — the standard leak-proof split (a document's split
    never changes when the corpus around it grows)."""
    b = hash_bucket(key_col, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically:
    ``bucket(key) < round(rate * 10000)``. The per-stratum rates are the
    mixture weights a training recipe assigns to each source; keeping
    the decision keyed (not ``rand()``) makes the sample stable under
    re-partitioning, retries, and incremental re-runs.

    The integer threshold is computed in Python (``int(round(...))``)
    and compared as a literal: thresholding via ``(rate * 10000.0)
    .cast('long')`` would truncate in Spark while a DuckDB audit's CAST
    rounds, so rates whose scaled value is inexact in binary floating
    point (0.07 -> 699.999...) would disagree between engines."""
    b = hash_bucket(key_col, salt, 10000)
    threshold = F.lit(int(round(float(default_rate) * 10000)))
    for stratum, r in sorted(rates.items()):
        thr = int(round(float(r) * 10000))
        threshold = F.when(F.col(stratum_col) == stratum, F.lit(thr)).otherwise(threshold)
    return df.filter(b < threshold)
