"""Streaming PSI monitor: windows matching the reference emit ~0 PSI,
a shifted window trips the alarm, each finalized window emits exactly
once (append mode), and the streaming number agrees with the batch
operator's formula on the same data."""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.streaming.drift_stream import psi_stream

T0 = dt.datetime(2024, 1, 2, 10, 0, 0)
EDGES = [10.0, 20.0, 30.0]

REF_VALS = [5.0, 12.0, 15.0, 22.0, 25.0, 35.0] * 10


def _ref(spark):
    return spark.createDataFrame([(v,) for v in REF_VALS], "value double")


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, value double").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, ckpt):
    emitted = []
    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    q = (
        psi_stream(stream, _ref(spark), "value", EDGES, "1 hour", "1 hour", "ts")
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return emitted


def test_stable_window_low_psi_shifted_window_alarms(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # 10:00 window mirrors the reference mix; 11:00 window is all
    # out-of-range mass; a 13:30 event pushes the watermark past both.
    stable = [(T0 + dt.timedelta(minutes=i), v) for i, v in enumerate(REF_VALS[:30])]
    shifted = [
        (T0 + dt.timedelta(hours=1, minutes=i), 45.0 + i) for i in range(30)
    ]
    closer = [(T0 + dt.timedelta(hours=3, minutes=30), 15.0)]
    _write_batch(spark, src, stable + shifted + closer)

    got = {r["window_start"]: r for r in _drain(spark, src, ckpt)}
    w_stable = got[T0]
    w_shifted = got[T0 + dt.timedelta(hours=1)]
    assert w_stable["n_cur"] == 30 and w_shifted["n_cur"] == 30
    assert w_stable["psi"] < 0.1 and w_stable["drifted"] == 0
    assert w_shifted["psi"] > 0.25 and w_shifted["drifted"] == 1


def test_each_window_finalizes_exactly_once_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_batch(
        spark,
        src,
        [(T0 + dt.timedelta(minutes=i), 15.0) for i in range(5)]
        + [(T0 + dt.timedelta(hours=2, minutes=30), 15.0)],  # closes 10:00
    )
    first = _drain(spark, src, ckpt)
    assert [r["window_start"] for r in first] == [T0]

    # Second batch closes the 12:00 window; 10:00 must NOT re-emit.
    _write_batch(spark, src, [(T0 + dt.timedelta(hours=4, minutes=30), 15.0)])
    second = _drain(spark, src, ckpt)
    assert [r["window_start"] for r in second] == [T0 + dt.timedelta(hours=2)]


def test_matches_batch_formula(spark, tmp_path):
    """The streaming PSI for a window equals the hand-computed batch
    formula (full-universe Laplace smoothing) on the same rows."""
    import math

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    cur_vals = [5.0, 5.0, 12.0, 22.0, 35.0, 35.0, 35.0, None]
    rows = [
        (T0 + dt.timedelta(minutes=i), v) for i, v in enumerate(cur_vals)
    ] + [(T0 + dt.timedelta(hours=2, minutes=30), 15.0)]
    _write_batch(spark, src, rows)
    got = {r["window_start"]: r for r in _drain(spark, src, ckpt)}[T0]

    def bucket(v):
        if v is None:
            return -1
        return sum(1 for e in EDGES if e <= v)

    buckets = [-1, 0, 1, 2, 3]
    k = len(buckets)
    rc = {b: sum(1 for v in REF_VALS if bucket(v) == b) for b in buckets}
    cc = {b: sum(1 for v in cur_vals if bucket(v) == b) for b in buckets}
    rt, ct = len(REF_VALS), len(cur_vals)
    psi = 0.0
    for b in buckets:
        p = (rc[b] + 1) / (rt + k)
        q = (cc[b] + 1) / (ct + k)
        psi += round((p - q) * round(math.log(p / q), 6), 9)
    assert got["n_cur"] == len(cur_vals)
    assert abs(got["psi"] - round(psi, 6)) < 1e-9
