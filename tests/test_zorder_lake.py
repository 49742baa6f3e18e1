"""Z-order lake layout: data identity, and the actual pruning benefit —
file-level min/max spans must be narrow on BOTH clustered dimensions,
where a single-column sort only narrows its own."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.sources import table
from polygon_io_data_ingestion_pipeline_spark.sources.lake import (
    write_lake_zordered,
    zorder_key,
)

N_FILES = 8


def _avg_file_span(spark, path, col, lo, hi):
    """Mean fractional (max-min)/range per parquet file for col."""
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        r = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
        spans.append((r[1] - r[0]) / (hi - lo))
    assert len(spans) == N_FILES
    return sum(spans) / len(spans)


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    ev = table(spark, "/root/testdata/sf0.01", "events").select("user_id", "value", "event_id")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]

    zpath = str(tmp_path / "zorder")
    write_lake_zordered(ev, zpath, ["user_id", "value"], n_files=N_FILES)

    # Baseline: same file count, sorted by user_id only.
    lpath = str(tmp_path / "linear")
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # Identity: the z-ordered lake holds exactly the same rows.
    a = spark.read.parquet(zpath)
    assert a.count() == ev.count()
    assert a.exceptAll(ev).count() == 0 and ev.exceptAll(a).count() == 0
    assert "__zorder" not in a.columns  # helper column dropped

    z_u = _avg_file_span(spark, zpath, "user_id", lo_u, hi_u)
    z_v = _avg_file_span(spark, zpath, "value", lo_v, hi_v)
    l_u = _avg_file_span(spark, lpath, "user_id", lo_u, hi_u)
    l_v = _avg_file_span(spark, lpath, "value", lo_v, hi_v)

    # Z-order narrows BOTH dimensions; with 8 files on a 2-d curve each
    # dimension lands near sqrt(1/8) of its range (measured ~0.25-0.6).
    assert z_u < 0.8 and z_v < 0.8
    # Against the user-sorted baseline, the OTHER dimension's pruning
    # improves by a wide margin (this is the point of the layout: a
    # value-predicate query touches ~1/3 the files)...
    assert z_v < 0.6 * l_v
    # ...and the balanced (worst-dimension) span beats the baseline's:
    # no single predicate column degrades to near-full-scan files.
    assert max(z_u, z_v) < max(l_u, l_v)


def test_zorder_key_validates_and_is_deterministic(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"), (99 - F.col("id")).cast("double").alias("y")
    )
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=40)
    k1 = [r["__zorder"] for r in zorder_key(df, ["x", "y"], bits=4).orderBy("x").collect()]
    k2 = [r["__zorder"] for r in zorder_key(df, ["x", "y"], bits=4).orderBy("x").collect()]
    assert k1 == k2  # quantile cuts + interleave are deterministic
    assert min(k1) >= 0 and max(k1) < (1 << 8)
