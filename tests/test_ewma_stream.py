"""Streaming EWMA: batch-split invariance vs the batch operator,
checkpointed state continuation, and audited late-event drops."""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.streaming import ewma_stream

T0 = dt.datetime(2024, 6, 3, 9, 30)
MIN = dt.timedelta(minutes=1)
SCHEMA = "user_id long, ts timestamp, value double"
ALPHA = 0.25


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, ckpt):
    emitted = []
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        ewma_stream(stream, ALPHA)
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def _loop(values, alpha=ALPHA):
    out, y = [], None
    for x in values:
        y = x if y is None else (1 - alpha) * y + alpha * x
        out.append(y)
    return out


def test_stream_matches_batch_recurrence_across_drains(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    vals = [100.0, 101.5, 99.0, 102.25, 103.0, 98.5]

    # First drain sees the first three events, second drain the rest:
    # the recurrence must continue from checkpointed state, not restart.
    _write(spark, src, [(7, T0 + i * MIN, v) for i, v in enumerate(vals[:3])])
    got = _drain(spark, src, ckpt)
    _write(spark, src, [(7, T0 + i * MIN, v) for i, v in enumerate(vals) if i >= 3])
    got += _drain(spark, src, ckpt)

    got.sort(key=lambda r: r["ts"])
    expect = _loop(vals)
    assert [r["ewma"] for r in got] == expect  # bit-identical, no tolerance
    assert not any(r["late"] for r in got)


def test_late_event_dropped_with_flag_not_corrupting(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _write(spark, src, [(1, T0, 10.0), (1, T0 + 2 * MIN, 20.0)])
    _drain(spark, src, ckpt)
    # late event BEFORE the frontier, plus one fresh event
    _write(spark, src, [(1, T0 + 1 * MIN, 999.0), (1, T0 + 3 * MIN, 30.0)])
    got = {r["ts"]: r for r in _drain(spark, src, ckpt)}

    late = got[T0 + 1 * MIN]
    assert late["late"] and late["ewma"] is None
    fresh = got[T0 + 3 * MIN]
    # recurrence continued from the uncorrupted frontier: y2 then x=30
    y = _loop([10.0, 20.0])[-1]
    assert fresh["ewma"] == (1 - ALPHA) * y + ALPHA * 30.0


def test_keys_isolated(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _write(
        spark,
        src,
        [(1, T0, 10.0), (2, T0, 1000.0), (1, T0 + MIN, 20.0), (2, T0 + MIN, 2000.0)],
    )
    got = _drain(spark, src, ckpt)
    by_key = {}
    for r in sorted(got, key=lambda r: r["ts"]):
        by_key.setdefault(r["key"], []).append(r["ewma"])
    assert by_key[1] == _loop([10.0, 20.0])
    assert by_key[2] == _loop([1000.0, 2000.0])


def test_null_values_do_not_poison_state(spark, tmp_path):
    """A null value row must emit the prior smoothed value and leave the
    recurrence untouched — pandas ewm(ignore_na=True) parity with the
    batch operator — including nulls that land last in a batch (which
    previously persisted NaN into state and corrupted every later
    emission) and leading nulls before any numeric observation."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    # leading null, numerics, then a trailing null closing the batch
    _write(
        spark,
        src,
        [(3, T0, None), (3, T0 + 1 * MIN, 10.0), (3, T0 + 2 * MIN, None)],
    )
    got = sorted(_drain(spark, src, ckpt), key=lambda r: r["ts"])
    assert got[0]["ewma"] is None  # no numeric observation yet
    assert got[1]["ewma"] == 10.0
    assert got[2]["ewma"] == 10.0  # carries prior, does not advance
    assert not any(r["late"] for r in got)

    # next batch restarts from checkpoint: NaN must NOT have entered state
    _write(spark, src, [(3, T0 + 3 * MIN, 20.0)])
    (fresh,) = _drain(spark, src, ckpt)
    assert fresh["ewma"] == (1 - ALPHA) * 10.0 + ALPHA * 20.0

    # the null rows advanced the frontier: a replay at their ts is late
    _write(spark, src, [(3, T0 + 2 * MIN, 999.0)])
    (late,) = _drain(spark, src, ckpt)
    assert late["late"] and late["ewma"] is None
