"""Incremental flat-file ingestion via Structured Streaming.

The reference's incremental story (SURVEY.md §2.9) is "notice new
CSV.GZ files, process them, overwrite the affected partitions, track
progress in a manifest" (reference: src/polygon_ingest/ingest.py whole
file; re-run/overwrite contract scripts/emit_split_backfill_cmds.py:29).
Structured Streaming's file source replaces all of it:

- the checkpoint is the progress ledger (exactly-once file tracking);
- ``Trigger.AvailableNow`` drains whatever has arrived then stops —
  the cron-driven batch shape the reference runs;
- the sink is the same dynamic-partition-overwrite lake writer, so
  late or corrected files simply rewrite their (ticker, month[, day])
  partitions — idempotent by construction, no watermark state needed
  (late data == recomputed partition, exactly like the reference).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources.csv_bars import normalize_bar_frame
from ..sources.lake import write_lake


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
        # Append, not dynamic overwrite: a micro-batch carries only the
        # NEW files, so overwriting its (ticker, month) partitions would
        # clobber rows ingested by earlier batches of the same month.
        # Exactly-once file tracking comes from the checkpoint; full
        # corrections/backfills run as batch jobs that deliberately
        # overwrite whole partitions (the reference's T2/T3 contract).
        write_lake(batch_df, lake_path, tf=tf, mode="append")

    writer = bars.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
