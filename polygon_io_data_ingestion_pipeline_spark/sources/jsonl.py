"""JSONL corpus source/sink — the interchange format training-data
pipelines actually exchange (one JSON object per line, optionally
gzip-compressed; the common shape for web-scrape dumps and published
corpora).

Scale notes:

- The reader takes an EXPLICIT schema. Schema inference on JSON is a
  full extra pass over the data (Spark samples every file); at 100 TB
  that doubles the scan, and worse, lets a late file silently widen a
  column. Projection still prunes: Jackson parses only the requested
  fields when the schema narrows the row (column pruning reaches the
  parser even though JSONL has no columnar layout).
- Malformed lines quarantine instead of failing the job: PERMISSIVE
  mode routes them to ``_corrupt_record`` and the caller splits good
  rows from quarantined ones once, map-side. A multi-billion-line
  scrape always contains breakage; a fail-fast reader is unusable and
  DROPMALFORMED silently lies about corpus size.
- gzip files are NOT splittable — one task per file regardless of
  size. Fine for the many-medium-files layout scrapes arrive in
  (the parallelism unit is the file), pathological for one giant
  archive; the writer therefore re-shards on write so downstream reads
  parallelize, and never emits a single monolithic gzip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as S

# The documents-table shape (TESTDATA.md): the corpus interchange schema.
DOCS_SCHEMA = S.StructType(
    [
        S.StructField("doc_id", S.LongType()),
        S.StructField("text", S.StringType()),
        S.StructField("lang", S.StringType()),
        S.StructField("source", S.StringType()),
        S.StructField("n_chars", S.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: S.StructType = DOCS_SCHEMA,
    strict: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus -> (good_rows, quarantined_lines).

    ``good`` carries the declared schema; ``bad`` is one string column
    (``raw_line``) holding each unparseable line verbatim for triage.
    A line is quarantined, never dropped or fatal: corpus-size
    accounting must see it.

    ``strict`` picks between two honest-but-different contracts:

    - ``True`` (default): good/bad are exact complements under the FULL
      declared schema — a type mismatch anywhere in the row quarantines
      it, whatever the caller projects or counts downstream. This is
      what corpus accounting needs, and it necessarily parses every
      declared field (no column pruning at the scan).
    - ``False``: Spark's native projection semantics — a row is good if
      the fields you actually read parsed. Column pruning reaches the
      JSON parser (reading ``doc_id, lang`` skips the heavy ``text``
      field entirely), but ``good``/``bad`` are no longer complements
      and counts depend on the projection. Right for extract-a-column
      scans where per-row accounting doesn't matter.
    """
    read_schema = S.StructType(list(schema.fields) + [S.StructField(_CORRUPT, S.StringType())])
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    # In strict mode both branches must keep every schema field in the
    # scan's requiredSchema, for two reasons at once: a scan pruned to
    # fewer fields does not PARSE the pruned fields, so a type mismatch
    # in them silently stops counting as corrupt (good.count() would
    # include mismatched rows; bad would miss them), and Spark
    # (correctly) refuses a query whose JSON scan reads ONLY the
    # corrupt column. The guard is tautological (greatest of 0/1 ints
    # >= 0) but not constant-foldable, so column pruning must retain
    # every field and the reader parses the full declared row whatever
    # the caller projects or counts downstream. No cache, no second
    # format: each branch stays one lazy scan.
    # F.lit(0) pads the operand list: Spark's greatest() requires two
    # arguments, so a single-field schema (a legitimate
    # extract-one-column read) would otherwise fail at plan time.
    full_parse_guard = (
        F.greatest(
            F.lit(0), *[F.col(f.name).isNotNull().cast("int") for f in schema.fields]
        )
        >= 0
    )
    good_cond = F.col(_CORRUPT).isNull()
    if strict:
        good_cond = good_cond & full_parse_guard
    good = df.filter(good_cond).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull() & full_parse_guard).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    target_partitions: int | None = None,
) -> None:
    """Write a corpus as (optionally gzipped) JSONL.

    ``target_partitions`` re-shards before the write: gzip output is
    read back one-task-per-file, so file count IS downstream read
    parallelism. Callers sizing for a cluster should pass roughly
    (corpus bytes / 128 MB); the default keeps the input partitioning.
    """
    if target_partitions is not None:
        df = df.repartition(target_partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
