"""Incremental training-corpus ingestion: JSONL files land -> streaming
exact dedup -> quality gate -> parquet corpus lake, exactly once.

The batch `corpus` CLI (cli.py cmd_corpus) is the full-rebuild shape;
this is the keep-it-fresh shape a production corpus actually runs: a
scrape keeps dropping JSONL shards into a directory, and the pipeline
must ingest each exactly once, drop documents it has already accepted
(re-delivered shards, mirrored pages), gate quality, and append — with
a restart recovering mid-stream from the checkpoint.

Composition of proven pieces, nothing bespoke:

- file-source streaming with an explicit schema (same contract as
  sources/jsonl.py: inference would re-scan and could widen columns);
- content-fingerprint dedup via ``dropDuplicatesWithinWatermark``
  (windowed_stream.dedup_stream rationale: state bounded by the
  watermark horizon, not O(all docs ever));
- the same map-side quality gate as the batch path
  (text.quality_filter), applied INSIDE the stream — stateless, so it
  adds no streaming state;
- an append-mode parquet sink. Append (not merge-overwrite like the
  bars lake): the dedup stage already guarantees each fingerprint
  passes at most once per horizon, and corpus rows are immutable facts
  (a re-scraped page is a NEW fingerprint), so the bar-lake's
  keep-last-by-key rewrite machinery would be paying for semantics
  documents don't have. foreachBatch replays after a commit-without-
  checkpoint are suppressed by batch-id tracking in the sink dir.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import quality_filter
from ..sources.jsonl import DOCS_SCHEMA
from ..sources.lease import LakeLease


def read_corpus_stream(
    spark: SparkSession,
    src_dir: str,
    ingest_ts_col: str = "ingest_ts",
) -> DataFrame:
    """Streaming JSONL document source with the declared corpus schema.

    Adds a processing-time ``ingest_ts`` column: documents carry no
    event time, so dedup state is bounded by arrival time — the
    watermark horizon is "how late can a shard re-deliver", which for
    file drops is a deployment constant, not a data property."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .json(src_dir)
        .withColumn(ingest_ts_col, F.current_timestamp())
    )


def corpus_pipeline(
    stream: DataFrame,
    watermark_delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """dedup (by content fingerprint, watermark-bounded state) ->
    quality gate (stateless map-side) -> accepted documents with their
    fingerprint kept for audit."""
    deduped = (
        stream.withColumn("fp", F.md5(F.lower(F.col(text_col))))
        .withWatermark("ingest_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    gated = quality_filter(
        deduped,
        text_col=text_col,
        keep_cols=("text", "lang", "source", "fp"),
        bigram="mapside",  # shuffle-free and STATE-free: the groupBy
        # formulation would be a streaming aggregation holding per-doc
        # state; the map-side fold is equality-tested against it
    )
    return gated.filter(F.col("keep")).select(
        "doc_id", "text", "lang", "source", "fp", "n_tokens"
    )


def write_corpus_batch(batch_df: DataFrame, batch_id: int, lake_path: str) -> None:
    """Idempotent batch sink: exactly-once by construction.

    foreachBatch is at-least-once: a batch whose output committed but
    whose checkpoint offset did not advance re-executes on restart.
    The output path is therefore KEYED BY BATCH ID
    (``batch_id=N/source=.../``) and written with overwrite — a replay
    rewrites the same directory with the same deterministic rows, so
    there is no ordering window at all (a bare append guarded by an
    after-the-fact ledger still double-appends when the crash lands
    between the append commit and the ledger line). ``batch_id``
    surfaces on read as a partition column — useful ingest lineage.
    The ledger remains as a cheap skip of already-committed replays
    (saves the rewrite, never needed for correctness)."""
    ledger = os.path.join(lake_path, "_committed_batches.json")
    done: set[int] = set()
    if os.path.exists(ledger):
        with open(ledger) as fh:
            done = {json.loads(line)["batch_id"] for line in fh if line.strip()}
    if batch_id in done:
        return
    # Lease over the write+ledger: a replay of this batch racing a lake
    # compaction would otherwise rewrite the same batch directory from
    # two stale listings.
    with LakeLease(batch_df.sparkSession, lake_path, holder="corpus_stream"):
        (
            batch_df.write.mode("overwrite")
            .partitionBy("source")
            .parquet(os.path.join(lake_path, f"batch_id={batch_id}"))
        )
        with open(ledger, "a") as fh:
            fh.write(json.dumps({"batch_id": batch_id}) + "\n")


def write_corpus_batch_exact(
    batch_df: DataFrame,
    batch_id: int,
    lake_path: str,
    normalize_form: str | None = None,
) -> None:
    """Exactly-once sink with UNBOUNDED-history dedup: state in the lake.

    ``corpus_pipeline``'s in-stream dedup is watermark-bounded (state
    must be, on an unbounded stream) — a shard re-delivered AFTER the
    horizon would be accepted again. This sink closes that gap by
    anti-joining each batch's fingerprints against every PREVIOUS
    committed batch in the lake itself before writing: the history
    "state" is the corpus, already durable and partitioned, so it costs
    no stream state at all. Per-batch cost is one anti join of a small
    batch (broadcast side) against a lake scan of the narrow ``fp``
    column — column-pruned, and the scan excludes the CURRENT batch's
    own partition so a foreachBatch replay regenerates identical rows
    instead of anti-joining against itself and writing nothing.
    """
    ledger = os.path.join(lake_path, "_committed_batches.json")
    done: set[int] = set()
    if os.path.exists(ledger):
        with open(ledger) as fh:
            done = {json.loads(line)["batch_id"] for line in fh if line.strip()}
    if batch_id in done:
        return
    from ..operators.dedup import incremental_dedup

    spark = batch_df.sparkSession
    history = None
    def _has_parquet(d: str) -> bool:
        # A batch that was entirely duplicates wrote ONLY _SUCCESS (no
        # partition dirs, no part files); including it in the history
        # read would fail schema inference on the all-empty case.
        for _root, _dirs, files in os.walk(os.path.join(lake_path, d)):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    prior = [
        d
        for d in (os.listdir(lake_path) if os.path.isdir(lake_path) else [])
        if d.startswith("batch_id=") and d != f"batch_id={batch_id}" and _has_parquet(d)
    ]
    if prior:
        history = (
            spark.read.option("basePath", lake_path)
            .parquet(*[os.path.join(lake_path, d) for d in prior])
            .select("fp")
        )
    # the crawl/corpus lanes already carry an fp column derived with
    # the lake's normalization form (round 13) — reuse it so the sink
    # never recomputes (or double-normalizes) the fingerprint and
    # there is exactly ONE fp derivation per lake; normalize_form is
    # only consulted for fp-less batches
    if "fp" in batch_df.columns:
        novel, _ = incremental_dedup(batch_df, history, id_col="doc_id", fp_col="fp")
    else:
        novel, _ = incremental_dedup(
            batch_df, history, id_col="doc_id", normalize_form=normalize_form
        )
    with LakeLease(spark, lake_path, holder="corpus_stream_exact"):
        (
            novel.write.mode("overwrite")
            .partitionBy("source")
            .parquet(os.path.join(lake_path, f"batch_id={batch_id}"))
        )
        with open(ledger, "a") as fh:
            fh.write(json.dumps({"batch_id": batch_id}) + "\n")


def write_corpus_batch_neardup(
    batch_df: DataFrame,
    batch_id: int,
    lake_path: str,
    threshold: float = 0.7,
    k: int = 8,
    tokenizer: str = "word",
    normalize_form: str | None = None,
) -> None:
    """Exactly-once sink with UNBOUNDED-history NEAR-duplicate dedup.

    :func:`write_corpus_batch_exact` rejects byte-identical re-posts
    beyond the watermark horizon; this sink also rejects EDITED
    re-posts (boilerplate tweaks, timestamp stamps, mirror banners) —
    the majority class of real corpus duplication. History state is the
    corpus's minhash signature table, persisted under
    ``<lake>/_signatures/ingest_batch=N/`` (underscore: invisible to
    lake readers; batch-keyed overwrite: a foreachBatch replay rewrites
    the same directory, exactly-once by construction like the doc dirs
    themselves). Per-batch cost: the batch's own signatures + band-key
    joins against the narrow signature history — the corpus text never
    re-reads.

    ``tokenizer`` / ``normalize_form`` (round 13) must stay CONSTANT
    for the lifetime of a signature history — signatures computed
    under different tokenizers or Unicode forms never estimate
    correctly against each other (see incremental_near_dedup).
    """
    ledger = os.path.join(lake_path, "_committed_batches.json")
    done: set[int] = set()
    if os.path.exists(ledger):
        with open(ledger) as fh:
            done = {json.loads(line)["batch_id"] for line in fh if line.strip()}
    if batch_id in done:
        return

    from ..operators.dedup import incremental_near_dedup

    spark = batch_df.sparkSession
    sig_root = os.path.join(lake_path, "_signatures")
    # the constancy contract, ENFORCED (round-13 review finding): a
    # later invocation that silently changes the tokenizer, the
    # Unicode form or k would compute signatures that never match
    # history — every near-duplicate of history re-admitted with no
    # error anywhere.  First batch records the settings next to the
    # ledger; every batch after must match.
    settings = {"tokenizer": tokenizer, "normalize_form": normalize_form, "k": k}
    spath = os.path.join(lake_path, "_neardup_settings.json")
    if os.path.exists(spath):
        with open(spath) as fh:
            prior_settings = json.load(fh)
        if prior_settings != settings:
            raise ValueError(
                "near-dup sink settings differ from this lake's history "
                f"({prior_settings} vs {settings}); signatures computed "
                "under different settings never match — re-ingest the "
                "lake or restore the recorded settings"
            )
    else:
        os.makedirs(lake_path, exist_ok=True)
        with open(spath, "w") as fh:
            json.dump(settings, fh)
    prior = [
        d
        for d in (os.listdir(sig_root) if os.path.isdir(sig_root) else [])
        if d.startswith("ingest_batch=") and d != f"ingest_batch={batch_id}"
    ]
    history = (
        spark.read.option("basePath", sig_root)
        .parquet(*[os.path.join(sig_root, d) for d in prior])
        .drop("ingest_batch")
        if prior
        else None
    )
    novel, sig_delta = incremental_near_dedup(
        batch_df, history, id_col="doc_id", k=k, threshold=threshold,
        tokenizer=tokenizer, normalize_form=normalize_form,
    )
    novel = novel.localCheckpoint()
    sig_delta = sig_delta.localCheckpoint()
    with LakeLease(spark, lake_path, holder="corpus_stream_neardup"):
        (
            novel.write.mode("overwrite")
            .partitionBy("source")
            .parquet(os.path.join(lake_path, f"batch_id={batch_id}"))
        )
        (
            sig_delta.write.mode("overwrite")
            .parquet(os.path.join(sig_root, f"ingest_batch={batch_id}"))
        )
        with open(ledger, "a") as fh:
            fh.write(json.dumps({"batch_id": batch_id}) + "\n")


def write_corpus_batch_indexed(
    batch_df: DataFrame,
    batch_id: int,
    lake_path: str,
    index_path: str,
    dim: int = 32,
    nlist: int = 8,
    max_train_rows: int = 65536,
    tokenizer: str = "word",
) -> None:
    """Corpus sink + streaming ANN maintenance in ONE foreachBatch stage:
    accepted documents land in the corpus lake (exactly once, via
    :func:`write_corpus_batch`) AND become searchable — feature-hash
    embedded and written into a materialized IVF index — before the
    batch commits.

    Index idempotency mirrors the lake's: each batch's vectors live
    under ``ingest_batch=<id>/list_id=<l>/`` written with overwrite, so
    a foreachBatch replay rewrites the same directory with the same
    deterministic rows (list_id stays a partition column, so
    ``ivf_topk_indexed`` partition-prunes exactly as on a batch-built
    index — pruning works on any partition level).  A separate ledger
    skips committed replays cheaply.  The first non-empty batch trains
    the codebook (bounded k-means sample) and writes the sidecar;
    every later batch assigns against the frozen codebook — the
    standard add-then-periodically-:func:`~..operators.similarity.
    rebalance_ivf_index` lifecycle.  The index write holds the index's
    maintenance lease so a concurrent rebalance cannot interleave with
    the append.
    """
    write_corpus_batch(batch_df, batch_id, lake_path)

    from ..operators.embed import feature_hash_embed
    from ..operators.similarity import (
        _ivf_lock_path,
        ivf_assign,
        kmeans_centroids,
        read_ivf_codebook,
    )

    spark = batch_df.sparkSession
    ledger = os.path.join(index_path, "_indexed_batches.json")
    # tokenizer='auto' routes unsegmented-script docs through char
    # bigrams (a spaceless CJK page otherwise embeds as a single-axis
    # unit vector — noise to the index).  MUST stay constant for the
    # index's lifetime AND match how queries are embedded.
    emb = feature_hash_embed(
        batch_df, dim=dim, tokenizer=tokenizer
    ).localCheckpoint()
    empty = not emb.take(1)

    # Shared index state (ledger, codebook sidecar, partition dirs) is
    # read AND written only under the lease — same concurrency contract
    # as write_corpus_batch_indexed_pq; a pre-lease ledger check lets
    # two concurrent writers both pass it and double-index the batch.
    with LakeLease(
        spark, index_path, holder="corpus_index_stream", lock_path=_ivf_lock_path(index_path)
    ):
        done: set[int] = set()
        if os.path.exists(ledger):
            with open(ledger) as fh:
                done = {
                    json.loads(line)["batch_id"] for line in fh if line.strip()
                }
        if batch_id in done:
            return
        has_codebook = os.path.exists(os.path.join(index_path, "_codebook.json"))
        if empty:
            if has_codebook:  # nothing to index; record the no-op commit
                with open(ledger, "a") as fh:
                    fh.write(json.dumps({"batch_id": batch_id}) + "\n")
            # no codebook yet either: leave training to a later batch
            return
        if has_codebook:
            cents = read_ivf_codebook(index_path)
        else:
            # Bootstrap clamp: a thin first batch cannot seed more
            # centroids than it has vectors — train with what exists and
            # let a later rebalance_ivf_index(nlist=target) widen the
            # codebook once the corpus can support it.
            cents = kmeans_centroids(
                emb,
                nlist=min(nlist, emb.count()),
                max_train_rows=max_train_rows,
                vec_col="embedding",
            )
            os.makedirs(index_path, exist_ok=True)
            with open(os.path.join(index_path, "_codebook.json"), "w") as fh:
                json.dump([[cid, vec] for cid, vec in cents], fh)
        (
            ivf_assign(emb, cents)
            .repartition("list_id")
            .write.partitionBy("list_id")
            .mode("overwrite")
            .parquet(os.path.join(index_path, f"ingest_batch={batch_id}"))
        )
        with open(ledger, "a") as fh:
            fh.write(json.dumps({"batch_id": batch_id}) + "\n")
    spark.catalog.refreshByPath(index_path)


def write_corpus_batch_indexed_pq(
    batch_df: DataFrame,
    batch_id: int,
    lake_path: str,
    index_path: str,
    dim: int = 32,
    nlist: int = 8,
    m: int = 4,
    ncodes: int = 8,
    max_train_rows: int = 65536,
    tokenizer: str = "word",
) -> None:
    """:func:`write_corpus_batch_indexed`'s compressed twin: accepted
    documents land in the corpus lake AND in a materialized IVF+PQ
    index — each row carrying its coarse ``list_id`` (partition
    pruning), PQ ``codes`` (the ADC scan columns) and raw embedding
    (re-rank fetch) — before the batch commits.

    Same idempotency scheme (``ingest_batch=<id>/list_id=<l>/``
    overwrite + ledger), same bootstrap shape: the first non-empty
    batch trains BOTH codebook levels on a bounded sample (clamped to
    what the batch can support) and writes the ``_ivfpq.json`` sidecar;
    every later batch encodes against the frozen books — the streaming
    half of the ``append_to_ivfpq_index`` /
    ``rebalance_ivfpq_index`` lifecycle, so a streaming-fed compressed
    index never needs a full rebuild just to keep growing."""
    write_corpus_batch(batch_df, batch_id, lake_path)

    from ..operators.embed import feature_hash_embed
    from ..operators.similarity import (
        _ivf_lock_path,
        _pq_codes,
        ivf_assign,
        kmeans_centroids,
        pq_codebooks_kmeans,
        read_ivfpq_meta,
    )

    spark = batch_df.sparkSession
    ledger = os.path.join(index_path, "_indexed_batches.json")
    sidecar = os.path.join(index_path, "_ivfpq.json")
    # tokenizer='auto' routes unsegmented-script docs through char
    # bigrams (a spaceless CJK page otherwise embeds as a single-axis
    # unit vector — noise to the index).  MUST stay constant for the
    # index's lifetime AND match how queries are embedded.
    emb = feature_hash_embed(
        batch_df, dim=dim, tokenizer=tokenizer
    ).localCheckpoint()
    empty = not emb.take(1)

    # Every read/write of shared index state -- the idempotency ledger,
    # the codebook sidecar, the partition dirs -- happens UNDER the
    # lease.  Checking the ledger (or the sidecar) before acquiring it
    # would let two writers sharing one index path both pass the check,
    # double-index the batch, and bootstrap-train over each other.
    with LakeLease(
        spark, index_path, holder="corpus_index_stream_pq",
        lock_path=_ivf_lock_path(index_path),
    ):
        done: set[int] = set()
        if os.path.exists(ledger):
            with open(ledger) as fh:
                done = {
                    json.loads(line)["batch_id"] for line in fh if line.strip()
                }
        if batch_id in done:
            return
        has_meta = os.path.exists(sidecar)
        if empty:
            if has_meta:  # nothing to index; record the no-op commit
                with open(ledger, "a") as fh:
                    fh.write(json.dumps({"batch_id": batch_id}) + "\n")
            # no codebooks yet either: leave training to a later batch
            return
        if has_meta:
            cents, books = read_ivfpq_meta(index_path)
        else:
            # Bootstrap clamp, both levels: a thin first batch cannot
            # seed more centroids/codes than it has vectors — train
            # with what exists and let rebalance_ivfpq_index(nlist=...,
            # ncodes=...) widen the books once the corpus supports it.
            n = emb.count()
            cents = kmeans_centroids(
                emb, nlist=min(nlist, n), max_train_rows=max_train_rows,
                vec_col="embedding",
            )
            books = pq_codebooks_kmeans(
                emb, m=m, ncodes=min(ncodes, n), max_train_rows=max_train_rows,
                vec_col="embedding",
            )
            os.makedirs(index_path, exist_ok=True)
            with open(sidecar, "w") as fh:
                json.dump(
                    {
                        "centroids": [[cid, vec] for cid, vec in cents],
                        "codebooks": [
                            [[cid, vec] for cid, vec in book] for book in books
                        ],
                    },
                    fh,
                )
        (
            ivf_assign(emb, cents)
            .withColumn("codes", _pq_codes("embedding", books))
            .repartition("list_id")
            .write.partitionBy("list_id")
            .mode("overwrite")
            .parquet(os.path.join(index_path, f"ingest_batch={batch_id}"))
        )
        with open(ledger, "a") as fh:
            fh.write(json.dumps({"batch_id": batch_id}) + "\n")
    spark.catalog.refreshByPath(index_path)


def start_corpus_ingest_indexed(
    spark: SparkSession,
    src_dir: str,
    lake_path: str,
    index_path: str,
    checkpoint: str,
    watermark_delay: str = "10 minutes",
    dim: int = 32,
    nlist: int = 8,
    tokenizer: str = "word",
):
    """ingest -> dedup -> gate -> corpus lake -> embed -> searchable IVF
    index, as ONE streaming pipeline (AvailableNow drain).  Documents
    accepted in batch k are retrievable via ``ivf_topk_indexed`` the
    moment batch k commits.  ``tokenizer`` must stay CONSTANT for the
    index's lifetime and match the query-embedding side."""
    import functools

    out = corpus_pipeline(read_corpus_stream(spark, src_dir), watermark_delay)
    return (
        out.writeStream.foreachBatch(
            functools.partial(
                write_corpus_batch_indexed,
                lake_path=lake_path,
                index_path=index_path,
                dim=dim,
                nlist=nlist,
                tokenizer=tokenizer,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_ingest_indexed_pq(
    spark: SparkSession,
    src_dir: str,
    lake_path: str,
    index_path: str,
    checkpoint: str,
    watermark_delay: str = "10 minutes",
    dim: int = 32,
    nlist: int = 8,
    m: int = 4,
    ncodes: int = 8,
    tokenizer: str = "word",
):
    """ingest -> dedup -> gate -> corpus lake -> embed -> searchable
    IVF+PQ index, as ONE streaming pipeline (AvailableNow drain).
    Documents accepted in batch k are retrievable via
    ``ivfpq_topk_rerank`` the moment batch k commits."""
    import functools

    out = corpus_pipeline(read_corpus_stream(spark, src_dir), watermark_delay)
    return (
        out.writeStream.foreachBatch(
            functools.partial(
                write_corpus_batch_indexed_pq,
                lake_path=lake_path,
                index_path=index_path,
                tokenizer=tokenizer,
                dim=dim,
                nlist=nlist,
                m=m,
                ncodes=ncodes,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_corpus_ingest(
    spark: SparkSession,
    src_dir: str,
    lake_path: str,
    checkpoint: str,
    watermark_delay: str = "10 minutes",
    exact_history: bool = False,
    near_dedup: bool = False,
    tokenizer: str = "word",
    normalize_form: str | None = None,
):
    """Drain available JSONL shards into the corpus lake, exactly once
    (AvailableNow trigger — the cron-driven batch shape).

    ``exact_history=True`` swaps the sink for
    :func:`write_corpus_batch_exact`, which also anti-joins each batch
    against the whole committed corpus — duplicates are rejected even
    past the stream-dedup watermark horizon, at the cost of a narrow
    lake scan per batch. ``near_dedup=True`` goes further
    (:func:`write_corpus_batch_neardup`): EDITED re-posts are rejected
    against the corpus's minhash-signature history.

    ``tokenizer`` / ``normalize_form`` reach the near-dup sink (and
    ``normalize_form`` the exact sink) — both must stay CONSTANT for a
    lake's lifetime; the near-dup sink persists and ENFORCES them
    against its signature history."""
    import functools

    if near_dedup:
        sink = functools.partial(
            write_corpus_batch_neardup,
            tokenizer=tokenizer,
            normalize_form=normalize_form,
        )
    elif exact_history:
        sink = functools.partial(
            write_corpus_batch_exact, normalize_form=normalize_form
        )
    else:
        sink = write_corpus_batch
    out = corpus_pipeline(read_corpus_stream(spark, src_dir), watermark_delay)
    return (
        out.writeStream.foreachBatch(
            functools.partial(sink, lake_path=lake_path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
