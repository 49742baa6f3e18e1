"""Streaming funnel vs the batch funnel operator: feeding the same
events through micro-batches (state carried across a checkpointed
restart) must land every user on the same stage times the batch
operator computes on the full table."""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.operators.funnel import funnel_user_stages
from polygon_io_data_ingestion_pipeline_spark.streaming.funnel_stream import funnel_stream

T0 = dt.datetime(2024, 5, 6, 12, 0, 0)
MIN = dt.timedelta(minutes=1)
SCHEMA = "user_id bigint, event_type string, ts timestamp"
STAGES = ["signup", "click", "purchase"]

BATCH1 = [
    (1, "signup", T0),
    (1, "click", T0),  # tie with signup -> must NOT count (strict >)
    (1, "click", T0 + 2 * MIN),
    (2, "click", T0 + 1 * MIN),  # click before signup -> ignored
    (2, "signup", T0 + 3 * MIN),
    (3, "signup", T0 + 1 * MIN),
]
BATCH2 = [
    (1, "purchase", T0 + 5 * MIN),
    (2, "click", T0 + 6 * MIN),  # now after signup -> stage 2
    (3, "purchase", T0 + 7 * MIN),  # purchase without click -> still stage 1
    (4, "click", T0 + 8 * MIN),  # never signed up -> no snapshot
]


def _drain(spark, src, ckpt, snaps):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        funnel_stream(stream, STAGES)
        .writeStream.foreachBatch(lambda df, _bid: snaps.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_funnel_stream_matches_batch_operator(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    snaps: list = []

    spark.createDataFrame(BATCH1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, snaps)
    n_after_b1 = len(snaps)
    spark.createDataFrame(BATCH2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, snaps)
    assert n_after_b1 and len(snaps) > n_after_b1  # both drains emitted

    latest = {}
    for r in snaps:  # update mode: last snapshot per user wins
        latest[r["user_id"]] = (
            r["deepest_stage"],
            tuple(r[f"ts_{i}"] for i in range(1, len(STAGES) + 1)),
        )

    # batch oracle on the full event set, with epoch-ns timestamps
    from pyspark.sql import functions as F

    all_events = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA).select(
        "user_id", "event_type", (F.unix_micros("ts") * 1000).alias("ts_us")
    )
    want = {}
    for r in funnel_user_stages(all_events, STAGES).collect():
        times = tuple(r[f"ts_{i}"] for i in range(1, len(STAGES) + 1))
        deepest = max(i + 1 for i, t in enumerate(times) if t is not None)
        want[r["user_id"]] = (deepest, times)

    assert latest == want
    assert 4 not in latest  # no stage-1 completion, no snapshot
    assert latest[1][0] == 3 and latest[2][0] == 2 and latest[3][0] == 1


def test_string_session_key(spark, tmp_path):
    """Regression: the output key column must mirror the input key's
    name AND type — a string session key used to crash the state
    function (hardcoded int64) and mislabel the column."""
    import datetime as dt
    import os

    from polygon_io_data_ingestion_pipeline_spark.streaming.funnel_stream import (
        funnel_stream,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 2, 10, 0, 0)
    spark.createDataFrame(
        [
            ("sess-a", "signup", t0),
            ("sess-a", "click", t0 + dt.timedelta(minutes=1)),
            ("sess-b", "click", t0),
        ],
        "session_id string, event_type string, ts timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "session_id string, event_type string, ts timestamp"
    ).parquet(src)
    emitted = []
    q = (
        funnel_stream(stream, ["signup", "click"], key_col="session_id")
        .writeStream.foreachBatch(lambda df, _b: emitted.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["session_id"]: r["deepest_stage"] for r in emitted}
    assert got == {"sess-a": 2}  # sess-b never signed up -> no snapshot
