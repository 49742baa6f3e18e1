"""Watermarked streaming operators: tumbling-window aggregation
(append-mode finalization, late-drop/late-accept, checkpointed restart)
and exactly-once-by-key dedup of re-delivered events."""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.streaming import dedup_stream, tumbling_counts

T0 = dt.datetime(2024, 1, 2, 10, 0, 0)
MIN = dt.timedelta(minutes=1)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, ckpt):
    emitted = []
    stream = spark.readStream.schema("event_type string, ts timestamp, value double").parquet(
        src
    )
    q = (
        tumbling_counts(stream, "1 hour", "1 hour")
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def test_watermark_finalizes_drops_and_accepts_late(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # Batch 1: two events in the 10:00 window, one at 12:30 that pushes
    # the watermark to 11:30 — finalizing the 10:00 window (end 11:00).
    _write_batch(
        spark,
        src,
        [
            ("click", T0 + 5 * MIN, 1.0),
            ("click", T0 + 10 * MIN, 2.0),
            ("view", T0 + 150 * MIN, 4.0),  # 12:30
        ],
    )
    got1 = _drain(spark, src, ckpt)
    final1 = {(r["window_start"], r["event_type"]): r for r in got1}
    assert (T0, "click") in final1, got1
    assert final1[(T0, "click")]["n"] == 2
    assert final1[(T0, "click")]["total_value"] == 3.0
    # 12:00 window is still open (watermark 11:30 < its end 13:00).
    assert not any(ws == T0 + 150 * MIN for ws, _ in final1)

    # Batch 2 (restarted query, state from checkpoint):
    # - 10:20 event is later than the watermark (10:00 window already
    #   finalized) -> dropped;
    # - 11:45 event lands in the 11:00 window, still open -> counted;
    # - 14:00 event advances the watermark to 13:00, finalizing both
    #   the 11:00 and 12:00 windows.
    _write_batch(
        spark,
        src,
        [
            ("click", T0 + 20 * MIN, 100.0),  # too late, dropped
            ("click", T0 + 105 * MIN, 8.0),  # 11:45, accepted
            ("view", T0 + 240 * MIN, 16.0),  # 14:00
        ],
    )
    got2 = _drain(spark, src, ckpt)
    final2 = {(r["window_start"], r["event_type"]): r for r in got2}
    # The finalized 10:00 window is NOT re-emitted or revised: the
    # too-late click never appears anywhere.
    assert (T0, "click") not in final2
    assert final2[(T0 + 60 * MIN, "click")]["n"] == 1
    assert final2[(T0 + 60 * MIN, "click")]["total_value"] == 8.0
    assert final2[(T0 + 150 * MIN - 30 * MIN, "view")]["n"] == 1  # 12:00 window
    # Across both drains each (window, key) was emitted exactly once.
    keys = [(r["window_start"], r["event_type"]) for r in got1 + got2]
    assert len(keys) == len(set(keys))


def _drain_dedup(spark, src, ckpt):
    emitted = []
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, value double"
    ).parquet(src)
    q = (
        dedup_stream(stream, key_cols=("event_id",))
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def _write_dedup_batch(spark, path, rows):
    spark.createDataFrame(rows, "event_id bigint, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_dedup_suppresses_redelivery_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # Batch 1: event 1 delivered twice inside one batch, event 2 once.
    _write_dedup_batch(
        spark,
        src,
        [(1, T0, 1.0), (1, T0, 1.0), (2, T0 + 5 * MIN, 2.0)],
    )
    got1 = _drain_dedup(spark, src, ckpt)
    assert sorted(r["event_id"] for r in got1) == [1, 2]

    # Batch 2 (restart, state from checkpoint): event 1 re-delivered —
    # its key is still inside the watermark horizon -> suppressed;
    # event 3 is new -> emitted once.
    _write_dedup_batch(spark, src, [(1, T0, 1.0), (3, T0 + 10 * MIN, 3.0)])
    got2 = _drain_dedup(spark, src, ckpt)
    assert sorted(r["event_id"] for r in got2) == [3]


def _drain_sessions(spark, src, ckpt, gap="30 minutes"):
    from polygon_io_data_ingestion_pipeline_spark.streaming.windowed_stream import (
        session_counts,
    )

    emitted = []
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    q = (
        session_counts(stream, gap, "1 hour", "ts", "user_id", "value")
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def _write_session_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_native_session_window_gap_split_and_merge(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # User 1: two bursts 40 min apart -> two sessions under a 30-min gap.
    # User 2: one burst. A far-future event closes everything.
    _write_session_batch(
        spark,
        src,
        [
            (1, T0, 1.0),
            (1, T0 + 10 * MIN, 2.0),
            (1, T0 + 50 * MIN, 4.0),
            (2, T0 + 5 * MIN, 8.0),
            (9, T0 + dt.timedelta(hours=6), 0.0),
        ],
    )
    got = {
        (r["user_id"], r["session_start"]): r for r in _drain_sessions(spark, src, ckpt)
    }
    s1a = got[(1, T0)]
    assert s1a["n"] == 2 and s1a["total_value"] == 3.0
    # Session end = last event + gap (native session-window semantics).
    assert s1a["session_end"] == T0 + 40 * MIN
    s1b = got[(1, T0 + 50 * MIN)]
    assert s1b["n"] == 1 and s1b["total_value"] == 4.0
    assert (2, T0 + 5 * MIN) in got


def test_native_session_window_bridging_event_merges_sessions(spark, tmp_path):
    """An event landing inside the gap between two provisional sessions
    must MERGE them — the case hand-rolled state usually gets wrong and
    the native operator handles by construction."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_session_batch(
        spark,
        src,
        [
            (1, T0, 1.0),
            (1, T0 + 45 * MIN, 4.0),   # > 30 min after T0: separate...
            (1, T0 + 20 * MIN, 2.0),   # ...until this bridges the gap
            (9, T0 + dt.timedelta(hours=6), 0.0),
        ],
    )
    got = [
        r
        for r in _drain_sessions(spark, src, ckpt)
        if r["user_id"] == 1
    ]
    assert len(got) == 1
    assert got[0]["n"] == 3 and got[0]["total_value"] == 7.0
    assert got[0]["session_start"] == T0
    assert got[0]["session_end"] == T0 + 75 * MIN
