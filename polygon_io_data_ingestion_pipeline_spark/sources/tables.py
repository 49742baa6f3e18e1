"""Canonical loaders for the driver-generated test tables.

All queries go through :func:`table` so type normalization happens in
exactly one place:

- ``events.ts`` has shipped in two storage forms across driver rounds:
  parquet TIMESTAMP(NANOS) (which Spark reads as int64 nanoseconds under
  ``spark.sql.legacy.parquet.nanosAsLong``) and plain TIMESTAMP(MICROS).
  Either way we expose the same canonical trio: ``ts_ns`` (exact long),
  ``ts_us`` (micros long, the ordering/compare column vs DuckDB
  ``epoch_us(ts)``), and ``ts`` (TIMESTAMP_NTZ for calendar work).
  This mirrors the reference's epoch-unit handling
  (reference: src/polygon_ingest/ingest.py:171-176 infers s/ms/us/ns by
  magnitude before converting to timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table with normalized column types."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Storage form A — TIMESTAMP(NANOS), surfaced as int64 nanos
            # via nanosAsLong: exact microsecond truncation (integer DIV,
            # no float round-trip) -> NTZ wall clock anchored to UTC.
            # DuckDB (the correctness oracle) truncates these values to
            # microseconds at scan time, so `ts_us` — not the raw nanos —
            # is the canonical ordering/compare column.
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_us", F.expr("ts_ns DIV 1000"))
                .withColumn("ts", F.expr("CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ)"))
            )
        elif ts_type in ("timestamp_ntz", "timestamp"):
            # Storage form B — native microsecond timestamps. Derive the
            # same canonical columns so every downstream query sees one
            # schema regardless of how the driver generated the table.
            # Session tz is forced to UTC by apply_runtime_confs, so the
            # NTZ->LTZ cast inside unix_micros is the identity mapping.
            df = (
                df.withColumn("ts", F.expr("CAST(ts AS TIMESTAMP_NTZ)"))
                .withColumn("ts_us", F.expr("unix_micros(CAST(ts AS TIMESTAMP))"))
                .withColumn("ts_ns", F.expr("ts_us * 1000"))
            )
    return df
