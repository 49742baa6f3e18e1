"""Incremental rollup maintenance: shard folding == full recompute,
replay no-ops, first-shard bootstrap, and mean derivability."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
    read_rollup,
    update_rollup,
)


def _shard(spark, rows):
    return spark.createDataFrame(rows, "k string, v double, w long")


def test_incremental_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    shards = [
        [("a", 1.0, 10), ("a", 2.0, 20), ("b", 3.0, 30)],
        [("a", 4.0, 40), ("c", 5.0, 50)],
        [("b", 6.0, 60), ("c", 7.0, 70), ("c", 8.0, 80)],
    ]
    for i, rows in enumerate(shards):
        res = update_rollup(spark, path, _shard(spark, rows), ["k"], ["v", "w"], f"s{i}")
        assert res["applied"]

    got = {r["k"]: r for r in read_rollup(spark, path).collect()}
    full = _shard(spark, [r for s in shards for r in s]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("sum_v"),
        F.sum("w").alias("sum_w"),
    )
    want = {r["k"]: r for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n_rows"] == want[k]["n_rows"]
        assert got[k]["sum_v"] == want[k]["sum_v"]
        assert got[k]["sum_w"] == want[k]["sum_w"]
    # mean is derivable without ever storing a non-mergeable aggregate
    assert got["a"]["sum_v"] / got["a"]["n_rows"] == (1.0 + 2.0 + 4.0) / 3


def test_replayed_shard_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "rollup")
    rows = [("a", 1.0, 1)]
    assert update_rollup(spark, path, _shard(spark, rows), ["k"], ["v", "w"], "s0")["applied"]
    before = {(r["k"], r["n_rows"], r["sum_v"]) for r in read_rollup(spark, path).collect()}
    res = update_rollup(spark, path, _shard(spark, rows), ["k"], ["v", "w"], "s0")
    assert not res["applied"]
    after = {(r["k"], r["n_rows"], r["sum_v"]) for r in read_rollup(spark, path).collect()}
    assert after == before


def test_ledger_and_lock_survive_table_overwrites(spark, tmp_path):
    import os

    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    update_rollup(spark, path, _shard(spark, [("a", 2.0, 2)]), ["k"], ["v"], "s1")
    # both shard ids still in the ledger after the second full overwrite
    with open(os.path.join(path, "_applied_shards.json")) as fh:
        ids = [line for line in fh if line.strip()]
    assert len(ids) == 2
    got = read_rollup(spark, path).collect()[0]
    assert got["n_rows"] == 2 and got["sum_v"] == 3.0


def test_corrupt_table_raises_instead_of_cold_starting(spark, tmp_path):
    """A damaged aggregate table must fail the update loudly — the old
    bare-except path silently replaced the accumulated rollup with one
    shard's worth of data."""
    import os

    import pytest as _pytest

    path = str(tmp_path / "rollup")
    update_rollup(spark, path, _shard(spark, [("a", 1.0, 1)]), ["k"], ["v"], "s0")
    # corrupt the table: truncate every parquet footer
    table = os.path.join(path, "table")
    for root, _dirs, files in os.walk(table):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                with open(full, "r+b") as fh:
                    fh.truncate(4)
    with _pytest.raises(Exception):
        update_rollup(spark, path, _shard(spark, [("a", 2.0, 2)]), ["k"], ["v"], "s1")
    # the failed update must not have been recorded as applied
    with open(os.path.join(path, "_applied_shards.json")) as fh:
        ids = [line for line in fh if line.strip()]
    assert len(ids) == 1
