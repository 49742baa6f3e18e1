"""The three streaming operators compose into one pipeline:

at-least-once file source (with cross-batch re-delivery)
  -> dedup_stream                 (watermark-bounded exactly-once-by-key)
  -> tumbling_counts              (chained in the SAME query: two
                                   stateful operators, append mode)
and
  -> dedup_stream -> parquet hop -> sessionize_stream (stateful
     applyInPandasWithState, update mode — staged through the lake, the
     production shape for an update-mode operator feeding analytics)

End-to-end counts must equal the batch equivalents computed on the
deduplicated input — re-delivered events influence nothing.
"""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.streaming import (
    dedup_stream,
    sessionize_stream,
    tumbling_counts,
)

T0 = dt.datetime(2024, 3, 4, 9, 0, 0)
MIN = dt.timedelta(minutes=1)

SCHEMA = "event_id bigint, user_id bigint, event_type string, ts timestamp, value double"

# Two at-least-once deliveries: batch 2 re-delivers two batch-1 events
# (ids 1 and 3) and one of its own twice (id 6).
BATCH1 = [
    (1, 10, "click", T0 + 2 * MIN, 1.0),
    (2, 10, "click", T0 + 10 * MIN, 2.0),
    (3, 20, "view", T0 + 20 * MIN, 4.0),
]
BATCH2 = [
    (1, 10, "click", T0 + 2 * MIN, 1.0),  # redelivered
    (3, 20, "view", T0 + 20 * MIN, 4.0),  # redelivered
    (4, 10, "click", T0 + 75 * MIN, 8.0),  # second hour window
    (5, 20, "view", T0 + 50 * MIN, 16.0),
    (6, 30, "click", T0 + 90 * MIN, 32.0),
    (6, 30, "click", T0 + 90 * MIN, 32.0),  # duplicated in-batch
    # pushes the watermark (1h delay) past every window above:
    (7, 30, "view", T0 + 200 * MIN, 0.5),
]
UNIQUE = sorted({r for r in BATCH1 + BATCH2}, key=lambda r: r[0])


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, ckpt, build, mode):
    emitted = []
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        build(stream)
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return emitted


def test_dedup_then_tumbling_in_one_query(spark, tmp_path):
    """dedup -> windowed agg chained in a single streaming query:
    exactly-once window rows whose counts ignore every re-delivery."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def build(stream):
        # dedup defines the (single) watermark; the window agg reuses it
        return tumbling_counts(
            dedup_stream(stream, key_cols=("event_id",)), "1 hour", watermark_delay=None
        )

    _write(spark, src, BATCH1)
    got = _drain(spark, src, ckpt, build, "append")
    _write(spark, src, BATCH2)
    got += _drain(spark, src, ckpt, build, "append")

    # batch oracle: same windows over the DEDUPED union of deliveries
    from pyspark.sql import functions as F

    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in (
            spark.createDataFrame(UNIQUE, SCHEMA)
            .filter(F.col("ts") < T0 + 150 * MIN)  # windows the watermark closed
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
            .collect()
        )
    }
    finalized = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in got}
    assert finalized == want
    # exactly-once: no (window, key) emitted twice across the drains
    keys = [(r["window_start"], r["event_type"]) for r in got]
    assert len(keys) == len(set(keys))


def test_dedup_then_sessionize_via_lake_hop(spark, tmp_path):
    """dedup -> parquet hop -> stateful sessionization: closed + open
    sessions over the deduped feed match batch sessionization."""
    src, lake = str(tmp_path / "src"), str(tmp_path / "lake")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    os.makedirs(src, exist_ok=True)
    gap_s = 1800  # 30 min

    def run_hop():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            dedup_stream(stream, key_cols=("event_id",))
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", lake)
            .option("checkpointLocation", ck1)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    sessions = []

    def run_sessionize():
        stream = spark.readStream.schema(SCHEMA).parquet(lake)
        q = (
            sessionize_stream(stream, gap_seconds=gap_s)
            .writeStream.foreachBatch(lambda df, _bid: sessions.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ck2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write(spark, src, BATCH1)
    run_hop()
    run_sessionize()
    _write(spark, src, BATCH2)
    run_hop()
    run_sessionize()

    # Latest emission per (user, session_start) wins (update mode).
    latest = {}
    for r in sessions:
        latest[(r["user_id"], r["session_start"])] = (
            r["session_end"],
            r["n_events"],
            r["closed"],
        )

    # batch oracle: per-user gap split of the deduped events
    by_user: dict[int, list[dt.datetime]] = {}
    for _eid, uid, _t, ts, _v in UNIQUE:
        by_user.setdefault(uid, []).append(ts)
    want = {}
    for uid, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for ts in tss[1:]:
            if (ts - prev).total_seconds() <= gap_s:
                prev, n = ts, n + 1
            else:
                want[(uid, start)] = (prev, n, True)
                start = prev = ts
                n = 1
        want[(uid, start)] = (prev, n, False)  # still open

    assert latest == want
