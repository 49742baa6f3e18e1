"""Streaming rollup: multi-drain incremental maintenance equals a batch
recompute of everything ever streamed; replays are ledger no-ops."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
    read_rollup,
    update_rollup,
)
from polygon_io_data_ingestion_pipeline_spark.streaming.rollup_stream import (
    start_rollup_stream,
)

SCHEMA = "k string, v double"


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


HIST = {"v": (0.0, 10.0, 5)}


def _drain(spark, src, rollup, ckpt):
    q = start_rollup_stream(
        spark,
        src,
        SCHEMA,
        rollup,
        ckpt,
        ["k"],
        ["v"],
        min_cols=["v"],
        distinct_cols=["k"],
        hist_cols=HIST,
    )
    q.awaitTermination(120)


def _hist(rows, lo=0.0, hi=10.0, bins=5):
    width = (hi - lo) / bins
    out: dict[str, list[int]] = {}
    for k, v in rows:
        b = min(max(int((v - lo) // width), 0), bins - 1)
        out.setdefault(k, [0] * bins)[b] += 1
    return out


def test_streamed_rollup_matches_batch_recompute(spark, tmp_path):
    src, rollup, ckpt = (str(tmp_path / d) for d in ("src", "roll", "ckpt"))
    os.makedirs(src)
    all_rows: list[tuple[str, float]] = []

    for batch in (
        [("a", 1.0), ("a", 2.0), ("b", 3.0)],
        [("a", 4.0), ("c", 5.0)],
        [("b", 6.0), ("c", 7.0)],
    ):
        _write(spark, src, batch)
        all_rows += batch
        _drain(spark, src, rollup, ckpt)
        want_hist = _hist(all_rows)
        got = {
            r["k"]: (r["n_rows"], r["sum_v"], r["min_v"], r["distinct_k"])
            for r in read_rollup(spark, rollup).collect()
        }
        got_hist = {
            r["k"]: list(r["hist_v"]) for r in read_rollup(spark, rollup).collect()
        }
        want = {
            r["k"]: (r["n"], r["s"], r["m"], 1)
            for r in spark.createDataFrame(all_rows, SCHEMA)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.min("v").alias("m"))
            .collect()
        }
        assert got == want  # current after EVERY drain, not just the last
        assert got_hist == want_hist  # histogram cells fold across drains too

    # replay suppression: re-applying a committed batch id changes nothing
    before = {r["k"]: (r["n_rows"], r["sum_v"]) for r in read_rollup(spark, rollup).collect()}
    res = update_rollup(
        spark,
        rollup,
        spark.createDataFrame([("a", 99.0)], SCHEMA),
        ["k"],
        ["v"],
        "batch_0",
        min_cols=["v"],
        distinct_cols=["k"],
        hist_cols=HIST,
    )
    assert not res["applied"]
    after = {r["k"]: (r["n_rows"], r["sum_v"]) for r in read_rollup(spark, rollup).collect()}
    assert after == before
    # ledger (inside the latest atomic commit) recorded exactly the
    # three stream batches
    latest = sorted(glob.glob(os.path.join(rollup, "_commit_v*.json")))[-1]
    assert json.load(open(latest))["applied_shards"] == ["batch_0", "batch_1", "batch_2"]


def test_streamed_cube_rollup_matches_batch_recompute(spark, tmp_path):
    """A streaming-maintained CUBE rollup (grouping_sets through the
    foreachBatch sink) equals a one-shot CUBE recompute of all facts."""
    import pyspark.sql.functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        cube_sets,
        read_rollup,
        update_rollup,
    )
    from polygon_io_data_ingestion_pipeline_spark.streaming.rollup_stream import (
        start_rollup_stream,
    )

    src = str(tmp_path / "facts")
    shards = [
        [("eu", "a", 1.0), ("us", "b", 2.0)],
        [("eu", "b", 4.0), ("eu", "a", 8.0)],
    ]
    schema = "r string, s string, v double"
    for rows in shards:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    roll, ckpt = str(tmp_path / "roll"), str(tmp_path / "ckpt")
    q = start_rollup_stream(
        spark, src, schema, roll, ckpt, ["r", "s"], ["v"],
        grouping_sets=cube_sets(["r", "s"]),
    )
    q.awaitTermination(120)
    got = {
        (r["_gid"], r["r"], r["s"]): (r["n_rows"], r["sum_v"])
        for r in read_rollup(spark, roll).collect()
    }
    full = str(tmp_path / "full")
    update_rollup(
        spark, full,
        spark.createDataFrame([x for s_ in shards for x in s_], schema),
        ["r", "s"], ["v"], "all", grouping_sets=cube_sets(["r", "s"]),
    )
    want = {
        (r["_gid"], r["r"], r["s"]): (r["n_rows"], r["sum_v"])
        for r in read_rollup(spark, full).collect()
    }
    assert got == want
    assert got[(3, None, None)] == (4, 15.0)
