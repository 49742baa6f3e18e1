"""Stateful streaming sessionization: applyInPandasWithState carrying
open sessions across micro-batches AND across query restarts (state
restored from the checkpoint), with update-mode emission semantics."""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.streaming import sessionize_stream

T0 = dt.datetime(2024, 1, 2, 9, 30, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id bigint, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, ckpt, name):
    # foreachBatch sink: the memory sink rejects checkpoint recovery,
    # and restart-with-restored-state is exactly what this test pins.
    emitted = []
    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=300)
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {(r["user_id"], r["closed"]): r for r in emitted}


def test_sessionize_stream_state_across_restarts(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    sec = dt.timedelta(seconds=1)
    # batch 1: user 1 has two events 100 s apart (one session);
    # user 2 has one event
    _write_batch(
        spark,
        src,
        [(1, T0), (1, T0 + 100 * sec), (2, T0)],
    )
    got = _drain(spark, src, ckpt, "sess1")
    s1 = got[(1, False)]
    assert (s1["session_start"], s1["session_end"], s1["n_events"]) == (
        T0,
        T0 + 100 * sec,
        2,
    )
    assert got[(2, False)]["n_events"] == 1
    assert (1, True) not in got and (2, True) not in got  # nothing closed yet

    # batch 2 (new query, same checkpoint -> state restored):
    # user 1 at +350 s: within 300 s of last-seen (+100) -> extends;
    # user 2 at +1000 s: gap > 300 -> closes the old session, opens new
    _write_batch(
        spark,
        src,
        [(1, T0 + 350 * sec), (2, T0 + 1000 * sec)],
    )
    got = _drain(spark, src, ckpt, "sess2")

    s1 = got[(1, False)]
    assert (s1["session_start"], s1["session_end"], s1["n_events"]) == (
        T0,
        T0 + 350 * sec,
        3,
    ), "restored state must extend the session opened in batch 1"
    closed2 = got[(2, True)]
    assert (closed2["session_start"], closed2["n_events"]) == (T0, 1)
    open2 = got[(2, False)]
    assert (open2["session_start"], open2["n_events"]) == (T0 + 1000 * sec, 1)
    # user 1 emitted no closed session
    assert (1, True) not in got
