"""Stream-stream interval join: in-window match, out-of-window
non-match, exactly-once left-outer emission after watermark passage,
checkpointed restart, and batch/stream parity."""

from __future__ import annotations

import datetime as dt
import os

from polygon_io_data_ingestion_pipeline_spark.streaming import stream_interval_join

T0 = dt.datetime(2024, 3, 4, 10, 0, 0)
MIN = dt.timedelta(minutes=1)

IMP_SCHEMA = "user_id string, ts timestamp, ad string"
CLK_SCHEMA = "user_id string, ts timestamp, target string"


def _write(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, imp_src, clk_src, ckpt, how):
    emitted = []
    imps = spark.readStream.schema(IMP_SCHEMA).parquet(imp_src)
    clks = spark.readStream.schema(CLK_SCHEMA).parquet(clk_src)
    q = (
        stream_interval_join(
            imps, clks, key="user_id", within="10 minutes", watermark="30 minutes", how=how
        )
        .writeStream.foreachBatch(lambda df, _bid: emitted.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return emitted


def test_inner_join_matches_only_in_window(spark, tmp_path):
    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(imp_src, exist_ok=True)
    os.makedirs(clk_src, exist_ok=True)

    _write(
        spark,
        imp_src,
        IMP_SCHEMA,
        [("alice", T0, "ad1"), ("bob", T0 + 2 * MIN, "ad2")],
    )
    _write(
        spark,
        clk_src,
        CLK_SCHEMA,
        [
            ("alice", T0 + 5 * MIN, "shop"),  # within 10 min -> match
            ("bob", T0 + 30 * MIN, "shop"),  # 28 min after imp -> no match
            ("carol", T0 + 1 * MIN, "shop"),  # no impression -> no match
        ],
    )
    got = _drain(spark, imp_src, clk_src, ckpt, "inner")
    assert len(got) == 1
    row = got[0]
    assert (row["user_id"], row["ad"], row["r_target"]) == ("alice", "ad1", "shop")
    assert row["r_ts"] == T0 + 5 * MIN


def test_left_outer_emits_unmatched_once_after_watermark(spark, tmp_path):
    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(imp_src, exist_ok=True)
    os.makedirs(clk_src, exist_ok=True)

    # Batch 1: one matched and one (eventually) unmatched impression.
    # No event is late enough yet to prove bob can't still convert.
    _write(
        spark,
        imp_src,
        IMP_SCHEMA,
        [("alice", T0, "ad1"), ("bob", T0, "ad2")],
    )
    _write(spark, clk_src, CLK_SCHEMA, [("alice", T0 + 3 * MIN, "shop")])
    got1 = _drain(spark, imp_src, clk_src, ckpt, "left_outer")
    matched1 = [r for r in got1 if r["r_user_id"] is not None]
    assert [(r["user_id"], r["r_target"]) for r in matched1] == [("alice", "shop")]
    # bob's null row must NOT appear yet — the watermark hasn't passed
    # T0 + within, so a matching click could still arrive.
    assert not any(r["r_user_id"] is None for r in got1)

    # Batch 2 (restart from checkpoint): a far-future click advances
    # both watermarks past bob's match horizon -> exactly one null row.
    _write(
        spark,
        clk_src,
        CLK_SCHEMA,
        [("dave", T0 + 120 * MIN, "elsewhere")],
    )
    _write(
        spark,
        imp_src,
        IMP_SCHEMA,
        [("dave", T0 + 120 * MIN, "ad3")],
    )
    got2 = _drain(spark, imp_src, clk_src, ckpt, "left_outer")
    nulls = [r for r in got2 if r["r_user_id"] is None]
    assert [(r["user_id"], r["ad"]) for r in nulls] == [("bob", "ad2")]

    # Batch 3: nothing new -> bob is not re-emitted (exactly once).
    _write(
        spark,
        clk_src,
        CLK_SCHEMA,
        [("erin", T0 + 180 * MIN, "late")],
    )
    got3 = _drain(spark, imp_src, clk_src, ckpt, "left_outer")
    assert not any(r["r_user_id"] is None and r["user_id"] == "bob" for r in got3)


def test_stream_inner_equals_batch_join(spark, tmp_path):
    """Same operator on batch frames == the union of streamed emissions."""
    imp_rows = [("u1", T0, "a"), ("u2", T0 + 1 * MIN, "b"), ("u3", T0 + 2 * MIN, "c")]
    clk_rows = [
        ("u1", T0 + 9 * MIN, "t1"),
        ("u2", T0 + 11 * MIN, "t2"),  # 10 min after imp -> boundary-in
        ("u3", T0 + 20 * MIN, "t3"),  # 18 min -> out
        ("u1", T0 - 1 * MIN, "t0"),  # before imp -> out
    ]
    imp_b = spark.createDataFrame(imp_rows, IMP_SCHEMA)
    clk_b = spark.createDataFrame(clk_rows, CLK_SCHEMA)
    batch = stream_interval_join(imp_b, clk_b, key="user_id", within="10 minutes")
    expect = sorted(
        (r["user_id"], r["ad"], r["r_target"]) for r in batch.collect()
    )
    assert expect == [("u1", "a", "t1"), ("u2", "b", "t2")]

    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(imp_src, exist_ok=True)
    os.makedirs(clk_src, exist_ok=True)
    _write(spark, imp_src, IMP_SCHEMA, imp_rows)
    _write(spark, clk_src, CLK_SCHEMA, clk_rows)
    got = _drain(spark, imp_src, clk_src, ckpt, "inner")
    assert sorted((r["user_id"], r["ad"], r["r_target"]) for r in got) == expect
