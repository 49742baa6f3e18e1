"""Keyed upsert (MERGE) into a plain-parquet lake: updated keys are
replaced wherever they live, inserts land, resident rows in touched
target partitions survive, untouched partitions are not rewritten, and
a partition whose only key moved away is removed from disk."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.sources import table
from polygon_io_data_ingestion_pipeline_spark.sources.lake import merge_into_lake


def _files_mtimes(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }


def _docs_lake(spark, tmp_path, sf="/root/testdata/sf0.001"):
    docs = table(spark, sf, "documents")
    lake = str(tmp_path / "corpus")
    docs.write.partitionBy("source").parquet(lake)
    return docs, lake


def test_upsert_replaces_updates_and_inserts(spark, tmp_path):
    docs, lake = _docs_lake(spark, tmp_path)
    victims = [r["doc_id"] for r in docs.select("doc_id").limit(2).collect()]
    max_id = docs.agg(F.max("doc_id")).first()[0]

    # Two in-place updates (text rewritten, same partition) + one insert.
    upd = (
        docs.filter(F.col("doc_id").isin(victims))
        .withColumn("text", F.lit("REDACTED"))
        .unionByName(
            docs.limit(1)
            .withColumn("doc_id", F.lit(max_id + 1000))
            .withColumn("text", F.lit("BRAND NEW"))
        )
    )
    stats = merge_into_lake(spark, lake, upd, "doc_id", ["source"])
    assert stats == {"rows_updated": 2, "rows_inserted": 1}

    after = spark.read.parquet(lake).select(*docs.columns)
    assert after.count() == docs.count() + 1
    got = {
        r["doc_id"]: r["text"]
        for r in after.filter(
            F.col("doc_id").isin(victims + [max_id + 1000])
        ).collect()
    }
    assert got[max_id + 1000] == "BRAND NEW"
    assert all(got[v] == "REDACTED" for v in victims)
    # Non-updated rows are untouched.
    want = docs.filter(~F.col("doc_id").isin(victims))
    kept = after.filter(~F.col("doc_id").isin(victims + [max_id + 1000]))
    assert kept.exceptAll(want).count() == 0 and want.exceptAll(kept).count() == 0


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    docs, lake = _docs_lake(spark, tmp_path)
    before = _files_mtimes(lake)
    one = docs.filter(F.col("source") == "src0").limit(1)
    upd = one.withColumn("text", F.lit("PATCHED"))
    stats = merge_into_lake(spark, lake, upd, "doc_id", ["source"])
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 0
    after = _files_mtimes(lake)
    for f, mt in before.items():
        if "source=src0" not in f:
            assert f in after and after[f] == mt, f"untouched partition rewritten: {f}"


def test_key_moving_partitions_leaves_no_ghost(spark, tmp_path):
    """A key whose partition value changes must vanish from its old
    partition; if it was the only row there, the directory itself goes."""
    docs, lake = _docs_lake(spark, tmp_path)
    # Build a single-row partition first.
    lone = (
        docs.limit(1)
        .withColumn("doc_id", F.lit(10**9))
        .withColumn("source", F.lit("srclone"))
    )
    merge_into_lake(spark, lake, lone, "doc_id", ["source"])
    assert glob.glob(os.path.join(lake, "source=srclone", "*.parquet"))

    # Now move that key into src0.
    moved = lone.withColumn("source", F.lit("src0"))
    stats = merge_into_lake(spark, lake, moved, "doc_id", ["source"])
    assert stats == {"rows_updated": 1, "rows_inserted": 0}
    after = spark.read.parquet(lake)
    assert after.filter(F.col("doc_id") == 10**9).count() == 1
    assert (
        after.filter((F.col("doc_id") == 10**9) & (F.col("source") == "src0")).count()
        == 1
    )
    assert not glob.glob(os.path.join(lake, "source=srclone", "*.parquet"))
