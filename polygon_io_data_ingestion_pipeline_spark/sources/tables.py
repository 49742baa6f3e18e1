"""Canonical loaders for the driver-generated test tables.

All queries go through :func:`table` so type normalization happens in
exactly one place:

- ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark cannot
  represent; with ``spark.sql.legacy.parquet.nanosAsLong`` the column
  arrives as int64 nanoseconds. We expose it as both ``ts_ns`` (exact
  long, used for ordering/compares against DuckDB ``epoch_ns(ts)``) and
  ``ts`` (TIMESTAMP_NTZ at microsecond precision for calendar work).
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
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos -> exact microsecond truncation (integer DIV, no
        # float round-trip) -> NTZ wall clock anchored to UTC. DuckDB
        # (the correctness oracle) truncates these TIMESTAMP(NANOS)
        # values to microseconds at scan time, so `ts_us` — not the raw
        # nanos — is the canonical ordering/compare column.
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns DIV 1000"))
            .withColumn("ts", F.expr("CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ)"))
        )
    return df
