"""Takedown deletion: targeted keys disappear, everything else survives
byte-for-byte, and untouched partitions are NOT rewritten."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.sources import table
from polygon_io_data_ingestion_pipeline_spark.sources.lake import delete_from_lake


def _files_mtimes(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }


def test_delete_rewrites_only_touched_partitions(spark, tmp_path):
    docs = table(spark, "/root/testdata/sf0.01", "documents")
    lake = str(tmp_path / "corpus")
    docs.write.partitionBy("source").parquet(lake)
    before = _files_mtimes(lake)

    # Delete three documents from src0/src1 (takedown request).
    victims = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .select("doc_id")
        .limit(3)
    )
    victim_ids = {r["doc_id"] for r in victims.collect()}
    keys = spark.createDataFrame([(i,) for i in victim_ids], "doc_id long")

    n = delete_from_lake(spark, lake, keys, "doc_id", ["source"])
    assert n == 3

    # (column order shifts on read: partition col appends last)
    after_df = spark.read.parquet(lake).select(*docs.columns)
    assert after_df.filter(F.col("doc_id").isin(*victim_ids)).count() == 0
    # Survivors identical to the original minus the victims.
    want = docs.filter(~F.col("doc_id").isin(*victim_ids))
    assert after_df.exceptAll(want).count() == 0 and want.exceptAll(after_df).count() == 0

    # Partitions not holding a victim keep their files untouched.
    touched_parts = {
        r["source"]
        for r in docs.filter(F.col("doc_id").isin(*victim_ids)).select("source").distinct().collect()
    }
    after = _files_mtimes(lake)
    for f, mt in before.items():
        part = [p for p in f.split(os.sep) if p.startswith("source=")][0].split("=")[1]
        if part not in touched_parts:
            assert f in after and after[f] == mt, f"untouched partition rewritten: {f}"


def test_delete_emptying_a_partition_removes_its_files(spark, tmp_path):
    """Dynamic overwrite cannot represent an empty partition; the
    operator must remove the emptied partition's directory itself or a
    full-partition takedown silently leaves the data on disk."""
    docs = table(spark, "/root/testdata/sf0.001", "documents")
    lake = str(tmp_path / "corpus")
    docs.write.partitionBy("source").parquet(lake)

    # Take down EVERY document of src0 plus one from src1.
    victims = docs.filter(
        (F.col("source") == "src0")
        | ((F.col("source") == "src1") & (F.col("doc_id") % 7 == 0))
    ).select("doc_id")
    n_victims = victims.count()
    keys = spark.createDataFrame([(r["doc_id"],) for r in victims.collect()], "doc_id long")

    assert delete_from_lake(spark, lake, keys, "doc_id", ["source"]) == n_victims

    # The src0 partition directory is gone from disk, not just unread.
    assert not glob.glob(os.path.join(lake, "source=src0", "*.parquet"))
    after_df = spark.read.parquet(lake).select(*docs.columns)
    assert after_df.filter(F.col("source") == "src0").count() == 0
    want = docs.join(keys, "doc_id", "left_anti")
    assert after_df.exceptAll(want).count() == 0 and want.exceptAll(after_df).count() == 0


def test_delete_missing_keys_is_noop(spark, tmp_path):
    docs = table(spark, "/root/testdata/sf0.001", "documents")
    lake = str(tmp_path / "corpus")
    docs.write.partitionBy("source").parquet(lake)
    before = _files_mtimes(lake)
    keys = spark.createDataFrame([(10**9,)], "doc_id long")
    assert delete_from_lake(spark, lake, keys, "doc_id", ["source"]) == 0
    assert _files_mtimes(lake) == before  # zero rewrites


def test_delete_reaches_null_partition(spark, tmp_path):
    """A takedown key living in a NULL partition (written as
    __HIVE_DEFAULT_PARTITION__) must still be deleted — plain ``==`` in
    the partition filter never matches NULL and silently skipped it
    (round-5 ADVICE defect); eqNullSafe fixes it."""
    lake = str(tmp_path / "corpus")
    rows = [(1, "a", "src0"), (2, "b", None), (3, "c", None), (4, "d", "src1")]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.partitionBy(
        "source"
    ).parquet(lake)
    assert any("__HIVE_DEFAULT_PARTITION__" in p for p in glob.glob(f"{lake}/*"))

    keys = spark.createDataFrame([(2,)], "doc_id long")
    n = delete_from_lake(spark, lake, keys, "doc_id", ["source"])
    assert n == 1
    after = spark.read.parquet(lake)
    assert after.filter(F.col("doc_id") == 2).count() == 0
    # the other null-partition row survives, as do the non-null partitions
    assert after.filter(F.col("doc_id") == 3).count() == 1
    assert after.count() == 3
