"""Incremental rollup maintenance: keep a keyed aggregate table current
as fact shards arrive, WITHOUT rescanning history.

The 100 TB pattern: dashboards and feature stores read a per-key
aggregate (counts, sums, means) of an append-only fact stream. A full
``groupBy`` recompute costs the whole corpus per refresh; maintaining
the aggregate incrementally costs one partial aggregation of the NEW
shard plus a merge against a table that is O(distinct keys) — the
materialized-view maintenance move, restricted to mergeable aggregates
(count/sum, and anything derivable from them: mean = sum/count).

Exactly-once: each shard carries a caller id; applied ids live in a
ledger next to the table, so re-delivered shards are no-ops — and the
read-merge-overwrite runs under the lake maintenance lease
(:mod:`..sources.lease`), so two concurrent updaters cannot both merge
against the same stale version and each lose the other's delta.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lease import LakeLease

_LEDGER = "_applied_shards.json"
#: aggregate rows live in a SUBDIRECTORY: a full-table overwrite deletes
#: its target directory first, which would wipe the ledger and the
#: maintenance lock if they shared the root.
_TABLE = "table"


def _partial(batch_df: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c)).alias(f"sum_{c}") for c in sum_cols
    ]
    return batch_df.groupBy(*keys).agg(*aggs)


def update_rollup(
    spark: SparkSession,
    rollup_path: str,
    batch_df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    shard_id: str,
) -> dict:
    """Fold one fact shard into the rollup table at ``rollup_path``.

    Returns ``{"applied": bool, "keys_touched": int}``; ``applied`` is
    False when the shard id is already in the ledger (replay no-op).
    The merge is a unionByName + re-sum of two partial-aggregate frames
    — both O(distinct keys), never the fact history.
    """
    ledger = os.path.join(rollup_path, _LEDGER)
    with LakeLease(spark, rollup_path, holder="rollup_update"):
        done: set[str] = set()
        if os.path.exists(ledger):
            with open(ledger) as fh:
                done = {json.loads(line)["shard_id"] for line in fh if line.strip()}
        if shard_id in done:
            return {"applied": False, "keys_touched": 0}
        delta = _partial(batch_df, keys, sum_cols).localCheckpoint()
        n_touched = delta.count()
        table_path = os.path.join(rollup_path, _TABLE)
        # Existence check, NOT a bare except around the read: a CORRUPT
        # table must raise, never be silently treated as a cold start
        # (which would replace the accumulated aggregate with one
        # shard's worth of data).
        if os.path.isdir(table_path) and any(
            f.endswith(".parquet")
            for _r, _d, files in os.walk(table_path)
            for f in files
        ):
            current = spark.read.parquet(table_path).localCheckpoint()
            merged = (
                current.unionByName(delta)
                .groupBy(*keys)
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
                )
            )
        else:  # first shard: no table yet
            merged = delta
        merged.write.mode("overwrite").parquet(table_path)
        with open(ledger, "a") as fh:
            fh.write(json.dumps({"shard_id": shard_id}) + "\n")
        spark.catalog.refreshByPath(table_path)
    return {"applied": True, "keys_touched": n_touched}


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The current aggregate table: (keys..., n_rows, sum_<col>...)."""
    return spark.read.parquet(os.path.join(rollup_path, _TABLE))
