"""Streaming rollup maintenance: keep a keyed aggregate table current as
fact files land, composing the file-source stream with
:func:`..operators.rollup.update_rollup` in a ``foreachBatch`` sink.

Exactly-once falls out of the rollup's own ledger: the batch id is the
shard id, so an at-least-once foreachBatch replay (commit landed,
checkpoint offset didn't) is a recorded no-op — no double counting, no
sink-side dedup state. Per batch the work is one partial aggregation of
the micro-batch plus an O(distinct keys) merge; the fact history is
never rescanned.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.rollup import update_rollup


def rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    rollup_path: str,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
    sample_cols: dict[str, tuple[str, int]] | None = None,
    topk_cols: dict[str, int] | None = None,
    grouping_sets: list[list[str]] | None = None,
) -> None:
    update_rollup(
        batch_df.sparkSession,
        rollup_path,
        batch_df,
        keys,
        sum_cols,
        shard_id=f"batch_{batch_id}",
        min_cols=min_cols,
        max_cols=max_cols,
        distinct_cols=distinct_cols,
        hist_cols=hist_cols,
        sample_cols=sample_cols,
        topk_cols=topk_cols,
        grouping_sets=grouping_sets,
    )


def start_rollup_stream(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    rollup_path: str,
    checkpoint: str,
    keys: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
    sample_cols: dict[str, tuple[str, int]] | None = None,
    topk_cols: dict[str, int] | None = None,
    grouping_sets: list[list[str]] | None = None,
) -> StreamingQuery:
    """Drain available fact files (parquet) into the rollup table
    (AvailableNow trigger — the cron-driven refresh shape)."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    return (
        stream.writeStream.foreachBatch(
            functools.partial(
                rollup_batch,
                rollup_path=rollup_path,
                keys=keys,
                sum_cols=sum_cols,
                min_cols=min_cols,
                max_cols=max_cols,
                distinct_cols=distinct_cols,
                hist_cols=hist_cols,
                sample_cols=sample_cols,
                topk_cols=topk_cols,
                grouping_sets=grouping_sets,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
