"""Incremental flat-file ingestion via Structured Streaming.

The reference's incremental story (SURVEY.md §2.9) is "notice new
CSV.GZ files, process them, overwrite the affected partitions, track
progress in a manifest" (reference: src/polygon_ingest/ingest.py whole
file; re-run/overwrite contract scripts/emit_split_backfill_cmds.py:29).
Structured Streaming's file source replaces all of it:

- the checkpoint is the progress ledger (each file is read once);
- ``Trigger.AvailableNow`` drains whatever has arrived then stops —
  the cron-driven batch shape the reference runs;
- the sink (:func:`write_ingest_batch`) merge-overwrites only the data
  partitions a micro-batch touches, keep-last by bar key, into the SAME
  ``ticker=/year=/month=[/day=]`` layout as the batch writer — so
  foreachBatch's at-least-once replays rewrite rather than duplicate,
  late/corrected files REPLACE the rows they re-deliver, and a batch
  ``write_lake`` backfill into the same root remains layout-compatible
  (the reference's re-run-and-overwrite contract,
  emit_split_backfill_cmds.py:29).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.csv_bars import normalize_bar_frame
from ..sources.lake import PARTITION_KEYS, _partition_filter, write_lake
from ..sources.lease import LakeLease

#: bar identity: one row per (ticker, instant) — the reference's
#: overwrite granularity (ingest.py:289-314 buckets by exactly this).
BAR_KEY = ["ticker", "datetime"]


def write_ingest_batch(batch_df: DataFrame, batch_id: int, lake_path: str, tf: str = "day") -> None:
    """Idempotent merge-overwrite micro-batch lake write.

    ``foreachBatch`` is at-least-once: a batch whose write committed but
    whose checkpoint offset didn't advance is re-executed on restart,
    and a corrected upstream file re-delivers keys the lake already
    holds. A plain append duplicates both. Here the sink:

    1. collects the batch's touched partition tuples (O(#partitions in
       the micro-batch) driver memory — bounded, tiny);
    2. reads ONLY those partitions back from the lake (exact OR-of-ANDs
       partition filter → partition-pruned scan) and eagerly
       ``localCheckpoint``\\ s them, truncating lineage so Spark permits
       overwriting the path it was read from, and bounding the
       materialized footprint to the touched partitions, not the lake;
    3. unions existing + incoming and keeps ONE row per ``BAR_KEY``,
       incoming rows winning over lake rows, with a deterministic
       value-column tiebreak so a replay reproduces the lake exactly;
    4. dynamic-partition-overwrites just the touched partitions via
       :func:`write_lake` — same layout, sort, and codec as batch
       ingest, so stream and batch backfills interleave freely.

    Net contract: exactly-once by overwrite at partition granularity;
    late data == recomputed partition, exactly like the reference's
    backfills (emit_split_backfill_cmds.py:29). ``batch_id`` is unused
    (kept for the foreachBatch signature) — idempotency comes from
    keyed merge, not batch bookkeeping.
    """
    keys = PARTITION_KEYS[tf]
    spark = batch_df.sparkSession
    incoming = batch_df
    touched = incoming.select(*keys).distinct().collect()
    if not touched:
        return

    # Null-safe OR-of-ANDs (shared with delete/merge) and the whole
    # read-merge-overwrite under the lake's maintenance lease: a
    # compaction interleaving between this sink's lake read and its
    # partition overwrite would otherwise race it for the same files.
    part_filter = _partition_filter(touched, keys)
    with LakeLease(spark, lake_path, holder="ingest_stream"):
        _write_ingest_batch_locked(incoming, part_filter, lake_path, tf)


def merge_keep_incoming(
    existing: DataFrame | None,
    incoming: DataFrame,
    key: Iterable[str] = tuple(BAR_KEY),
) -> DataFrame:
    """The sink's batch-overlap resolution as a PURE transform: union
    ``existing`` (lake rows) with ``incoming`` (the micro-batch) and
    keep ONE row per ``key``, incoming winning over existing, ties
    within a source broken by every non-key value column descending
    (nulls last, columns in sorted-name order) so a replay reproduces
    the lake byte-for-byte.  This is the late-correction-wins contract
    of the reference's re-run-and-overwrite backfills
    (emit_split_backfill_cmds.py:29) — factored out of the foreachBatch
    sink so the registry query ``events_ingest_merge_keep_last`` can
    hash-verify the exact resolution window the stream runs."""
    key = list(key)
    inc = incoming.withColumn("__src", F.lit(1))
    if existing is None:
        merged = inc
    else:
        merged = existing.withColumn("__src", F.lit(0)).unionByName(
            inc, allowMissingColumns=True
        )
    tiebreak = [
        F.col(c).desc_nulls_last()
        for c in sorted(merged.columns)
        if c not in key and c != "__src"
    ]
    w = Window.partitionBy(*key).orderBy(F.col("__src").desc(), *tiebreak)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def _write_ingest_batch_locked(incoming, part_filter, lake_path: str, tf: str) -> None:
    spark = incoming.sparkSession
    try:
        existing = (
            spark.read.option("mergeSchema", True)
            .parquet(lake_path)
            .filter(part_filter)
            .localCheckpoint(eager=True)
        )
    except AnalysisException:  # first batch: no lake yet
        existing = None
    write_lake(merge_keep_incoming(existing, incoming, BAR_KEY), lake_path, tf=tf)


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
