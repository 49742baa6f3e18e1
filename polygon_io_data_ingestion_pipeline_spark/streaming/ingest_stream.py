"""Incremental flat-file ingestion via Structured Streaming.

The reference's incremental story (SURVEY.md §2.9) is "notice new
CSV.GZ files, process them, overwrite the affected partitions, track
progress in a manifest" (reference: src/polygon_ingest/ingest.py whole
file; re-run/overwrite contract scripts/emit_split_backfill_cmds.py:29).
Structured Streaming's file source replaces all of it:

- the checkpoint is the progress ledger (each file is read once);
- ``Trigger.AvailableNow`` drains whatever has arrived then stops —
  the cron-driven batch shape the reference runs;
- the sink (:func:`write_ingest_batch`) writes each micro-batch into
  its own ``batch_id=`` partition subtree with dynamic overwrite, so
  foreachBatch's at-least-once replays rewrite rather than duplicate —
  exactly-once by overwrite, no watermark state needed (late data ==
  recomputed partition, exactly like the reference's backfills).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.csv_bars import normalize_bar_frame
from ..sources.lake import PARTITION_KEYS


def write_ingest_batch(batch_df: DataFrame, batch_id: int, lake_path: str, tf: str = "day") -> None:
    """Idempotent micro-batch lake write.

    ``foreachBatch`` is at-least-once: a batch whose write committed but
    whose checkpoint offset didn't advance is re-executed on restart. A
    plain append would duplicate those rows. Here every batch lands
    under its own ``batch_id=<N>`` partition subtree via dynamic
    partition overwrite, so a replayed batch REPLACES its earlier output
    — exactly-once by overwrite, the same contract as the reference's
    re-run-and-overwrite backfills (emit_split_backfill_cmds.py:29).
    Readers see ``batch_id`` as one extra partition column; ticker/time
    pruning is unaffected.
    """
    keys = PARTITION_KEYS[tf]
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        batch_df.withColumn("batch_id", F.lit(int(batch_id)))
        .repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions("datetime")
        .write.partitionBy("batch_id", *keys)
        .option("compression", "zstd")
        .mode("overwrite")
        .parquet(lake_path)
    )
    spark.catalog.refreshByPath(lake_path)


def stream_ingest_bars(
    spark: SparkSession,
    source_glob: str,
    lake_path: str,
    checkpoint: str,
    tf: str = "day",
    watchlist: Iterable[str] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start (and return) the ingestion stream; call ``.awaitTermination()``
    to drain with AvailableNow semantics.

    The file-source stream requires a homogeneous header across
    ``source_glob`` (the schema is probed once). Polygon flat files per
    feed satisfy this; to ingest several header layouts, run one stream
    per layout-specific glob (batch ``read_bar_flatfiles`` groups by
    header automatically).
    """
    # File-source streams need an explicit schema: probe it from the
    # current files with a bounded batch read (header only, no data scan).
    probe = spark.read.option("header", True).csv(source_glob)
    reader = spark.readStream.schema(probe.schema).option("header", True)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.csv(source_glob)

    bars = normalize_bar_frame(raw, tf=tf, watchlist=watchlist)

    def sink(batch_df, batch_id: int) -> None:
        write_ingest_batch(batch_df, batch_id, lake_path, tf=tf)

    writer = bars.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
