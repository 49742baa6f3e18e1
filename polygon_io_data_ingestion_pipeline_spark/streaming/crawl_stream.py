"""Streaming crawl ingestion: WARC files -> corpus lake, exactly once.

The crawl side of :mod:`.corpus_stream`: crawlers drop ``.warc.gz``
files into a directory; each micro-batch explodes the NEW files into
records through the bounded-memory walk (:mod:`..sources.archive`),
then runs the same batch pipeline the ``corpus --input-format warc``
CLI runs — payload-digest dedup (revisit records honored), URL dedup,
charset-aware text extraction with mojibake quarantine, language ID,
quality gate — and commits the accepted documents idempotently
(batch-keyed overwrite + ledger, same contract as every corpus sink).

Scale shape: the file-stream source tracks processed files in the
checkpoint (a new file is read exactly once, parallelism = new-file
count per batch); all per-batch dedup is within-batch plus, with
``exact_history=True``, an anti-join against the committed corpus's
``fp`` column — durable state in the lake, zero stream state.  The
in-batch transforms are the BATCH operators unchanged: foreachBatch is
the boundary where a micro-batch is just a DataFrame.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.archive import (
    _BATCH_BYTES,
    _BATCH_ROWS,
    WARC_SCHEMA,
    _warc_mapper,
    decode_text_members,
    html_to_text,
    warc_digest_dedup,
)
from .corpus_stream import write_corpus_batch, write_corpus_batch_exact


def read_warc_stream(
    spark: SparkSession,
    path_glob: str,
    record_types: tuple[str, ...] = ("response", "revisit"),
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
) -> DataFrame:
    """Streaming twin of :func:`..sources.archive.read_warc`: the
    binaryFile file-stream source discovers new crawl files (content
    column pruned — only paths flow), and the same bounded-memory
    mapper explodes them to record rows."""
    # streaming sources demand an explicit schema; binaryFile's is fixed
    # (and selecting only `path` prunes the content read, as in batch)
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length bigint, content binary"
        )
        .load(path_glob)
        .select("path")
    )
    return files.mapInPandas(
        _warc_mapper(record_types, batch_rows, batch_bytes), schema=WARC_SCHEMA
    )


def crawl_records_to_docs(
    records: DataFrame, main_content: bool = False
) -> DataFrame:
    """WARC record rows -> gated corpus documents (the batch transform
    used inside foreachBatch, and reusable on any batch of records):
    digest dedup -> text/* responses -> URL dedup -> charset-aware
    extraction (HTML walk or plain decode; ``decode_ok=false`` mojibake
    quarantined) -> language ID + fingerprint -> Gopher-style quality
    gate.  Output: (doc_id, text, lang, source, url, fp, n_tokens)."""
    from ..operators.text import predicted_lang_script, quality_filter
    from ..operators.urls import url_dedup

    recs = warc_digest_dedup(records).filter(
        (F.col("record_type") == "response")
        & F.col("content_type").startswith("text/")
    )
    recs = url_dedup(recs, order_col="warc_date")
    html = recs.filter(F.col("content_type").startswith("text/html"))
    plain = recs.filter(~F.col("content_type").startswith("text/html"))
    parsed = html_to_text(html, main_content=main_content).unionByName(
        decode_text_members(plain), allowMissingColumns=True
    )
    docs = (
        parsed.filter(F.col("decode_ok").isNull() | F.col("decode_ok"))
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            F.xxhash64("url", "warc_date").alias("doc_id"),
            "text",
            # script-based first (crawls are multilingual and the decode
            # upstream is charset-correct), keyword heuristic for Latin
            predicted_lang_script("text").alias("lang"),
            F.element_at(F.split("warc_file", "/"), -1).alias("source"),
            "url",
            F.md5(F.lower(F.col("text"))).alias("fp"),
        )
    )
    gated = quality_filter(
        docs,
        keep_cols=("text", "lang", "source", "url", "fp"),
        bigram="mapside",
    )
    return gated.filter(F.col("keep")).select(
        "doc_id", "text", "lang", "source", "url", "fp", "n_tokens"
    )


def write_crawl_batch(
    batch_df: DataFrame,
    batch_id: int,
    lake_path: str,
    main_content: bool = False,
    exact_history: bool = False,
) -> None:
    """foreachBatch sink: records -> documents -> idempotent corpus
    commit.  The docs frame feeds one sink write but its lineage tops a
    NON-SPLITTABLE decompress+parse; persist for the sink's own
    multi-pass (exact-history anti-join reads it twice) and unpersist
    before returning — a long-running stream must not leak one cached
    frame per batch."""
    docs = crawl_records_to_docs(batch_df, main_content=main_content).persist()
    try:
        sink = write_corpus_batch_exact if exact_history else write_corpus_batch
        sink(docs, batch_id, lake_path)
    finally:
        docs.unpersist()


def start_crawl_ingest(
    spark: SparkSession,
    src_glob: str,
    lake_path: str,
    checkpoint: str,
    main_content: bool = False,
    exact_history: bool = False,
):
    """Drain available crawl files into the corpus lake, exactly once
    (AvailableNow trigger — the cron-driven batch shape).  A restart
    resumes from the checkpoint: files already processed are never
    re-read, and a replayed in-flight batch rewrites its own batch
    directory byte-for-byte (idempotent sink)."""
    return (
        read_warc_stream(spark, src_glob)
        .writeStream.foreachBatch(
            functools.partial(
                write_crawl_batch,
                lake_path=lake_path,
                main_content=main_content,
                exact_history=exact_history,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
