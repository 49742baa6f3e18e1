"""Streaming crawl ingestion: WARC files dropped in a directory drain
into the corpus lake exactly once — digest/URL dedup, charset-aware
extraction with mojibake quarantine, quality gate, idempotent commit,
checkpoint-resumed incremental drains, exact-history cross-batch dedup."""

from __future__ import annotations

import gzip
import os

from polygon_io_data_ingestion_pipeline_spark.streaming.crawl_stream import (
    crawl_records_to_docs,
    start_crawl_ingest,
)

GOOD_A = (
    "the data in a table is the value of the row and the key for the "
    "batch while the line in a window is the part of the sort"
)
GOOD_B = (
    "a scan of the table shows the key and the value where the row of "
    "the batch meets the line of the window in a sort of merge"
)


def _warc_record(rtype, url, body, extra=""):
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: 2026-08-14T00:00:00Z\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http(payload, ctype=b"text/html"):
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        + b"\r\nContent-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
    )


def _page(text):
    return f"<html><body><p>{text}</p></body></html>".encode()


def _write_warc(dirpath, name, recs):
    (dirpath / name).write_bytes(b"".join(gzip.compress(r) for r in recs))


def _drain(spark, src, lake, ckpt, **kw):
    q = start_crawl_ingest(spark, str(src), str(lake), str(ckpt), **kw)
    q.awaitTermination(120)


def test_crawl_drain_dedup_gate_and_resume(spark, tmp_path):
    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    digest = "sha1:SAMEPAYLOADDIGEST"
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(_page(GOOD_A)),
                     extra=f"WARC-Payload-Digest: {digest}\r\n"),
        # same digest, later refetch: digest-deduped without hashing
        _warc_record("response", "http://x.example/a-copy", _http(_page(GOOD_A)),
                     extra=f"WARC-Payload-Digest: {digest}\r\n"
                     "WARC-Date: 2026-08-15T00:00:00Z\r\n"),
        # tracking-param refetch: URL-deduped
        _warc_record("response", "http://x.example/a?utm_source=f", _http(_page(GOOD_A))),
        # too short: gated
        _warc_record("response", "http://x.example/tiny", _http(_page("tiny"))),
        # mojibake: declared shift_jis, invalid in it AND utf-8 -> quarantined
        _warc_record("response", "http://x.example/moji",
                     _http(b"<p>broken \x80\x80\x80\x80 page</p>",
                           ctype=b"text/html; charset=shift_jis")),
    ])
    _drain(spark, src, lake, ckpt)
    rows = spark.read.parquet(str(lake)).collect()
    urls = sorted(r["url"] for r in rows)
    assert urls == ["http://x.example/a"]
    assert rows[0]["text"] == GOOD_A and rows[0]["lang"] == "en"

    # second drain: ONLY the new file is read (checkpoint), new doc lands
    _write_warc(src, "b.warc.gz", [
        _warc_record("response", "http://x.example/b", _http(_page(GOOD_B))),
    ])
    _drain(spark, src, lake, ckpt)
    urls = sorted(r["url"] for r in spark.read.parquet(str(lake)).collect())
    assert urls == ["http://x.example/a", "http://x.example/b"]


def test_crawl_exact_history_rejects_cross_batch_duplicate(spark, tmp_path):
    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(_page(GOOD_A))),
    ])
    _drain(spark, src, lake, ckpt, exact_history=True)
    # same content re-crawled later under a different URL in a NEW file:
    # past any stream state, caught by the lake-history anti-join
    _write_warc(src, "b.warc.gz", [
        _warc_record("response", "http://mirror.example/a", _http(_page(GOOD_A))),
        _warc_record("response", "http://x.example/b", _http(_page(GOOD_B))),
    ])
    _drain(spark, src, lake, ckpt, exact_history=True)
    rows = spark.read.parquet(str(lake)).collect()
    assert sorted(r["url"] for r in rows) == [
        "http://x.example/a", "http://x.example/b",
    ]


def test_crawl_batch_transform_replay_identity(spark, tmp_path):
    """crawl_records_to_docs is deterministic on a fixed record batch —
    the property the batch-keyed overwrite sink's exactly-once relies
    on when a foreachBatch replay rewrites its directory."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import read_warc

    src = tmp_path / "crawl"
    src.mkdir()
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(_page(GOOD_A))),
        _warc_record("response", "http://x.example/b", _http(_page(GOOD_B))),
    ])
    recs = read_warc(spark, str(src))
    one = sorted(map(tuple, crawl_records_to_docs(recs).collect()))
    two = sorted(map(tuple, crawl_records_to_docs(recs).collect()))
    assert one == two and len(one) == 2


FRENCH = (
    "le gouvernement a annoncé que les résultats de l'étude seront "
    "publiés la semaine prochaine et que les chercheurs pourront enfin "
    "comparer les données avec celles des années précédentes"
)


def test_crawl_robots_gate_rejects_disallowed_and_keeps_multilingual(spark, tmp_path):
    """robots_agent: the batch's own robots.txt captures gate the
    pages — a disallowed URL never reaches the lake, the robots.txt
    fetch itself is evidence (not a document), and a clean French page
    lands with lang='fr' (multilingual stopword gate + real Latin
    langid).  Replay of the same records is byte-identical."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import read_warc

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    robots = b"User-agent: *\nDisallow: /private/\n"
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/robots.txt",
                     _http(robots, ctype=b"text/plain")),
        _warc_record("response", "http://x.example/public/ok", _http(_page(GOOD_A))),
        _warc_record("response", "http://x.example/private/secret", _http(_page(GOOD_B))),
        _warc_record("response", "http://fr.example/article", _http(_page(FRENCH))),
    ])
    _drain(spark, src, lake, ckpt, robots_agent="*")
    rows = {r["url"]: r for r in spark.read.parquet(str(lake)).collect()}
    assert set(rows) == {"http://x.example/public/ok", "http://fr.example/article"}
    assert rows["http://fr.example/article"]["lang"] == "fr"
    assert rows["http://x.example/public/ok"]["lang"] == "en"

    # replay identity: the gated transform is deterministic on a fixed
    # batch (the exactly-once contract of the batch-keyed sink)
    recs = read_warc(spark, str(src))
    one = sorted(map(tuple, crawl_records_to_docs(recs, robots_agent="*").collect()))
    two = sorted(map(tuple, crawl_records_to_docs(recs, robots_agent="*").collect()))
    assert one == two
    assert sorted(r[4] for r in one) == [
        "http://fr.example/article", "http://x.example/public/ok",
    ]


def test_streaming_robots_latest_capture_wins_over_url_dedup(spark, tmp_path):
    """A robots.txt that TIGHTENED mid-crawl: url_dedup keeps the
    earliest fetch per URL, but the rules must come from the LATEST
    capture (regression: deriving rules post-url-dedup inverted this
    and diverged from the CLI path)."""
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import read_warc

    src = tmp_path / "crawl"
    src.mkdir()
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/robots.txt",
                     _http(b"User-agent: *\nDisallow:\n", ctype=b"text/plain")),
        _warc_record("response", "http://x.example/robots.txt",
                     _http(b"User-agent: *\nDisallow: /private/\n", ctype=b"text/plain"),
                     extra="WARC-Date: 2026-08-15T00:00:00Z\r\n"),
        _warc_record("response", "http://x.example/private/page", _http(_page(GOOD_A))),
        _warc_record("response", "http://x.example/open/page", _http(_page(GOOD_B))),
    ])
    docs = crawl_records_to_docs(read_warc(spark, str(src)), robots_agent="*")
    urls = sorted(r["url"] for r in docs.collect())
    assert urls == ["http://x.example/open/page"]


def test_streaming_outlinks_feed_the_next_frontier(spark, tmp_path):
    """The crawl loop closes: drain a batch with outlinks_path set, the
    edge table lands batch-keyed, and frontier(edges, lake) yields the
    not-yet-fetched destinations for the next drop."""
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        crawl_frontier,
    )

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt, edges_dir = tmp_path / "lake", tmp_path / "ckpt", tmp_path / "edges"
    page_a = (
        f"<html><body><p>{GOOD_A}</p>"
        '<a href="/b">b</a><a href="/undiscovered">n</a></body></html>'
    ).encode()
    page_b = f"<html><body><p>{GOOD_B}</p><a href='/undiscovered'>n</a></body></html>".encode()
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(page_a)),
        _warc_record("response", "http://x.example/b", _http(page_b)),
    ])
    _drain(spark, src, lake, ckpt, outlinks_path=str(edges_dir))
    edges = spark.read.parquet(str(edges_dir))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert ("http://x.example/a", "http://x.example/b") in got
    assert ("http://x.example/a", "http://x.example/undiscovered") in got
    fetched = spark.read.parquet(str(lake)).select("url")
    frontier = {
        r["url"]: r["in_refs"]
        for r in crawl_frontier(edges, fetched).collect()
    }
    # /b was fetched this batch -> not frontier; /undiscovered has two
    # distinct referrers and is the next fetch
    assert frontier == {"http://x.example/undiscovered": 2}


def test_streaming_schedule_closes_the_loop(spark, tmp_path):
    """schedule_path: each drained batch emits schedule/batch_id=N with
    robots-disallowed frontier URLs dropped and the host's Crawl-delay
    attached — the ready-to-fetch table, end-to-end in the stream."""
    import pytest

    from polygon_io_data_ingestion_pipeline_spark.streaming.crawl_stream import (
        write_crawl_batch,
    )

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    edges_dir, sched_dir = tmp_path / "edges", tmp_path / "sched"
    robots = (
        b"User-agent: *\r\nDisallow: /private/\r\nCrawl-delay: 2.5\r\n"
    )
    page_a = (
        f"<html><body><p>{GOOD_A}</p>"
        '<a href="/next">n</a><a href="/private/x">p</a></body></html>'
    ).encode()
    feed = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<item><title>fresh</title>"
        b"<link>http://x.example/fresh</link></item>"
        b"<item><title>blocked</title>"
        b"<link>http://x.example/private/y</link></item>"
        b"<item><title>gated</title>"
        b"<link>http://x.example/tiny</link></item>"
        b"</channel></rss>"
    )
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/robots.txt",
                     _http(robots, ctype=b"text/plain")),
        _warc_record("response", "http://x.example/a", _http(page_a)),
        # fetched but quality-gated (too short): never reaches the lake,
        # yet must count as ATTEMPTED or the feed re-schedules it forever
        _warc_record("response", "http://x.example/tiny", _http(_page("tiny"))),
        _warc_record("response", "http://x.example/feed.xml",
                     _http(feed, ctype=b"application/rss+xml")),
        # a sitemap response in the SAME batch: its locs are candidates
        # too (one decoded xml frame serves both discovery parsers)
        _warc_record("response", "http://x.example/sitemap.xml",
                     _http(b"<urlset><url><loc>http://x.example/mapped"
                           b"</loc></url></urlset>",
                           ctype=b"application/xml")),
    ])
    _drain(
        spark, src, lake, ckpt,
        robots_agent="*",
        outlinks_path=str(edges_dir),
        schedule_path=str(sched_dir),
    )
    sched = {r["url"]: r for r in spark.read.parquet(str(sched_dir)).collect()}
    # /next (outlink) and /fresh (RSS entry — the syndication discovery
    # channel) are schedulable with the host's declared delay; the
    # robots-disallowed /private/x outlink AND /private/y feed entry
    # must NOT be scheduled; /a is already fetched; /tiny was fetched
    # and gate-dropped - attempted, so the feed cannot re-schedule it
    assert set(sched) == {
        "http://x.example/next", "http://x.example/fresh",
        "http://x.example/mapped",
    }
    assert sched["http://x.example/mapped"]["crawl_delay"] == 2.5
    assert sched["http://x.example/next"]["crawl_delay"] == 2.5
    assert sched["http://x.example/fresh"]["crawl_delay"] == 2.5
    assert sched["http://x.example/next"]["host"] == "x.example"
    # the lake holds only /a (tiny gated, feed XML excluded from docs)
    assert sorted(
        r["url"] for r in spark.read.parquet(str(lake)).collect()
    ) == ["http://x.example/a"]
    # schedule_path without outlinks_path is a usage error, not silence
    with pytest.raises(ValueError, match="outlinks_path"):
        write_crawl_batch(
            spark.createDataFrame([], "url string"), 0, str(lake),
            schedule_path=str(sched_dir),
        )


def test_streaming_clf_gate_drops_bad_pages(spark, tmp_path):
    """The model-based quality gate, in-stream: a NB model trained on
    good/bad references (persisted with nb_save, served with nb_load)
    drops the spam-like page from the batch with accounting, keeps the
    reference-like one, and a checkpointed replay stays deterministic."""
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_load,
        nb_save,
        nb_train,
    )

    spammy = (
        "the cheap pills and the lucky prize of the winner in the draw "
        "are the offer of the day while the bonus of the deal is the "
        "gift of the spin and the jackpot of the club"
    )
    train = spark.createDataFrame(
        [("good", GOOD_A), ("good", GOOD_B)]
        + [("bad", spammy), ("bad", spammy)],
        "label string, text string",
    )
    nb_save(nb_train(train), str(tmp_path / "model"))
    model = nb_load(spark, str(tmp_path / "model"))

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/good", _http(_page(GOOD_A))),
        _warc_record("response", "http://x.example/spam", _http(_page(spammy))),
    ])
    _drain(spark, src, lake, ckpt, clf_model=model)
    urls = sorted(r["url"] for r in spark.read.parquet(str(lake)).collect())
    assert urls == ["http://x.example/good"]

    # drain again with a NEW checkpoint (replay of the same files):
    # the gate is deterministic, the idempotent sink rewrites the same
    # batch directory and the lake is unchanged
    _drain(spark, src, lake, tmp_path / "ckpt2", clf_model=model)
    urls2 = sorted(r["url"] for r in spark.read.parquet(str(lake)).collect())
    assert urls2 == urls


def test_streaming_schedule_fails_loudly_on_corrupt_lake(spark, tmp_path):
    """A lake that EXISTS but cannot be read (corrupt footer, transient
    FS error) must fail the batch — silently treating it as a zero-doc
    lake would drop the lake side of the fetched set and re-schedule
    already-kept URLs (round-11 ADVICE fix).  The genuinely-absent-lake
    case stays a normal state (covered by the schedule loop test, whose
    first batch schedules before any lake write)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    edges_dir, sched_dir = tmp_path / "edges", tmp_path / "sched"
    # a corrupt data file inside a committed batch directory (a bare
    # root-level file is skipped by partition discovery, not read)
    (lake / "batch_id=999").mkdir(parents=True)
    (lake / "batch_id=999" / "part-00000.parquet").write_bytes(
        b"this is not a parquet file"
    )
    page_a = (
        f"<html><body><p>{GOOD_A}</p><a href=\"/next\">n</a></body></html>"
    ).encode()
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(page_a)),
    ])
    with pytest.raises(StreamingQueryException):
        _drain(
            spark, src, lake, ckpt,
            outlinks_path=str(edges_dir),
            schedule_path=str(sched_dir),
        )

def _drain_all(spark, src, lake, ckpt, timeout=560, **kw):
    q = start_crawl_ingest(spark, str(src), str(lake), str(ckpt), **kw)
    import time
    t0 = time.time()
    while q.isActive and time.time() - t0 < timeout:
        q.awaitTermination(5)
    assert not q.isActive, "stream did not drain in time"
    if q.exception() is not None:
        raise q.exception()


def test_compact_attempted_unit_set_identity_and_idempotence(spark, tmp_path):
    """compact_attempted over a 24-batch attempted root: folds every
    batch dir into one negative-id baseline, preserves the URL set
    exactly, no-ops below the threshold, is idempotent, and a crash-
    replayed batch dir landing AFTER compaction only adds harmless
    duplicates (set unchanged, folded by the next compaction)."""
    import re

    from polygon_io_data_ingestion_pipeline_spark.streaming.crawl_stream import (
        compact_attempted,
    )

    root = str(tmp_path / "sched_attempted")
    urls = []
    for b in range(24):
        batch_urls = [f"http://x.example/p{b}_{j}" for j in range(3)]
        urls += batch_urls
        spark.createDataFrame(
            [(u,) for u in batch_urls], "url string"
        ).write.parquet(os.path.join(root, f"batch_id={b}"))

    def dirs():
        return sorted(
            d for d in os.listdir(root)
            if re.fullmatch(r"batch_id=-?\d+", d)
        )

    def urlset():
        return sorted(
            r["url"] for r in
            spark.read.parquet(root).select("url").distinct().collect()
        )

    before = urlset()
    stats = compact_attempted(spark, root, min_batch_dirs=16)
    assert stats == {"dirs_before": 24, "dirs_after": 1, "compacted": 24}
    assert dirs() == ["batch_id=-1"]
    assert urlset() == before
    # idempotent: a second call is a below-threshold no-op
    stats2 = compact_attempted(spark, root, min_batch_dirs=16)
    assert stats2["compacted"] == 0 and urlset() == before
    # crash-replayed batch rewrites its dir next to the baseline:
    # duplicates only, set unchanged; the next compaction folds it
    spark.createDataFrame(
        [(u,) for u in [f"http://x.example/p3_{j}" for j in range(3)]],
        "url string",
    ).write.parquet(os.path.join(root, "batch_id=3"))
    assert urlset() == before
    stats3 = compact_attempted(spark, root, min_batch_dirs=2)
    assert stats3["compacted"] == 2 and dirs() == ["batch_id=-2"]
    assert urlset() == before


def test_attempted_compaction_bounds_dirs_across_long_crawl(spark, tmp_path):
    """Long-running crawl (21 one-file batches via maxFilesPerTrigger,
    compact_attempted_every=5): the attempted root's directory count
    stays bounded while the frontier semantics are unchanged — each
    batch schedules exactly its own newly-announced URL, and the
    gate-dropped /tiny that every batch's feed keeps announcing never
    re-schedules even after its batch dir was folded into the
    baseline.  (The uncompacted frontier behavior itself is pinned by
    test_streaming_schedule_closes_the_loop; the unit test above pins
    set identity — together: identical frontier pre/post compaction.)"""
    import re

    src = tmp_path / "crawl"
    src.mkdir()

    def feed(extra_url=None):
        items = (
            b"<item><title>gated</title>"
            b"<link>http://x.example/tiny</link></item>"
        )
        if extra_url:
            items += (
                b"<item><title>new</title><link>"
                + extra_url.encode() + b"</link></item>"
            )
        return (
            b'<?xml version="1.0"?><rss version="2.0"><channel>'
            + items + b"</channel></rss>"
        )

    import time as _time

    _write_warc(src, "b000.warc.gz", [
        _warc_record("response", "http://x.example/tiny",
                     _http(_page("tiny"))),
        _warc_record("response", "http://x.example/feed.xml",
                     _http(feed(), ctype=b"application/rss+xml")),
    ])
    for i in range(1, 21):
        _write_warc(src, f"b{i:03d}.warc.gz", [
            _warc_record("response", f"http://x.example/p{i}",
                         _http(_page(GOOD_A + f" page {i}"))),
            _warc_record("response", f"http://x.example/feed{i}.xml",
                         _http(feed(f"http://x.example/fresh{i}"),
                               ctype=b"application/rss+xml")),
        ])
    # pin batch order: the file stream picks files by modification time,
    # and sub-second writes tie — make b000 (the /tiny fetch) strictly
    # oldest so every later batch sees it as already attempted
    now = _time.time()
    for i in range(21):
        os.utime(src / f"b{i:03d}.warc.gz", (now - 2100 + i * 100,) * 2)
    _drain_all(
        spark, src, tmp_path / "lake", tmp_path / "ckpt",
        outlinks_path=str(tmp_path / "edges"),
        schedule_path=str(tmp_path / "sched"),
        compact_attempted_every=5,
        max_files_per_trigger=1,
    )
    att = tmp_path / "sched_attempted"
    dirs = [d for d in os.listdir(att) if re.fullmatch(r"batch_id=-?\d+", d)]
    # compaction every 5 batches: baseline + at most 5 accrued dirs
    assert len(dirs) <= 7, dirs
    # the outlinks edge root folds on the same cadence (round-12 ask
    # #8) — bounded dirs; set identity + pagerank invariance are pinned
    # by test_compact_edges_unit_pagerank_and_anchor_identity
    edirs = [
        d for d in os.listdir(tmp_path / "edges")
        if re.fullmatch(r"batch_id=-?\d+", d)
    ]
    assert len(edirs) <= 7, edirs
    # attempted set == every response URL any batch carried
    attempted = {
        r["url"] for r in
        spark.read.parquet(str(att)).select("url").distinct().collect()
    }
    expect = {"http://x.example/tiny", "http://x.example/feed.xml"}
    for i in range(1, 21):
        expect |= {f"http://x.example/p{i}", f"http://x.example/feed{i}.xml"}
    assert attempted == expect
    # frontier semantics unchanged through compaction: batch i schedules
    # exactly its own fresh{i}; /tiny (attempted, gate-dropped) never
    sched = spark.read.parquet(str(tmp_path / "sched")).collect()
    by_batch = {}
    for r in sched:
        by_batch.setdefault(r["batch_id"], set()).add(r["url"])
    assert all("tiny" not in u for us in by_batch.values() for u in us)
    # every fresh URL scheduled exactly once, one per feed-bearing batch
    # (file->batch order is the stream's choice, not the filename's)
    all_sched = [u for us in by_batch.values() for u in us]
    assert sorted(all_sched) == sorted(
        f"http://x.example/fresh{i}" for i in range(1, 21)
    )
    assert all(len(us) == 1 for us in by_batch.values())


def test_streaming_clf_drift_monitor_fires_on_model_staleness(
    spark, tmp_path, capsys
):
    """clf_drift_path: each gated batch folds its log-odds histogram
    into a versioned rollup (shard id = batch id) and PSI-compares the
    new slice against history.  Batch 2 carries reference-like pages
    (matching batch 1's distribution tail); batch 3's content drifts
    hard toward the bad reference — the report fires with
    drifted=True.  A fresh-checkpoint replay is a rollup-ledger no-op
    (the histogram does not double-count)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_load,
        nb_save,
        nb_train,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.rollup import (
        rollup_hist_counts,
        rollup_versions,
    )

    spammy = (
        "the cheap pills and the lucky prize of the winner in the draw "
        "are the offer of the day while the bonus of the deal is the "
        "gift of the spin and the jackpot of the club"
    )
    train = spark.createDataFrame(
        [("good", GOOD_A), ("good", GOOD_B), ("bad", spammy), ("bad", spammy)],
        "label string, text string",
    )
    nb_save(nb_train(train), str(tmp_path / "model"))
    model = nb_load(spark, str(tmp_path / "model"))

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    drift = str(tmp_path / "clf_drift")
    kw = dict(clf_model=model, clf_margin=-1e9, clf_drift_path=drift)

    _write_warc(src, "a.warc.gz", [
        _warc_record("response", f"http://x.example/g{i}",
                     _http(_page(GOOD_A + f" row {i}")))
        for i in range(4)
    ])
    _drain(spark, src, lake, ckpt, **kw)
    assert len(rollup_versions(drift)) == 1
    # batch 2: same distribution -> report fires, not drifted
    _write_warc(src, "b.warc.gz", [
        _warc_record("response", f"http://x.example/h{i}",
                     _http(_page(GOOD_B + f" row {i}")))
        for i in range(4)
    ])
    _drain(spark, src, lake, ckpt, **kw)
    out = capsys.readouterr().out
    assert "clf-drift[batch 1]:" in out and "drifted=0" in out
    # batch 3: the crawl's content has drifted to spam-like pages
    _write_warc(src, "c.warc.gz", [
        _warc_record("response", f"http://x.example/s{i}",
                     _http(_page(spammy + f" row {i}")))
        for i in range(4)
    ])
    _drain(spark, src, lake, ckpt, **kw)
    out = capsys.readouterr().out
    assert "clf-drift[batch 2]:" in out and "drifted=1" in out

    # replay with a fresh checkpoint: every batch is a ledger no-op —
    # version count and histogram cells unchanged (no double counting)
    before = sorted(
        map(tuple, rollup_hist_counts(spark, drift, "log_odds").collect())
    )
    n_vers = len(rollup_versions(drift))
    _drain(spark, src, lake, tmp_path / "ckpt2", **kw)
    assert len(rollup_versions(drift)) == n_vers
    after = sorted(
        map(tuple, rollup_hist_counts(spark, drift, "log_odds").collect())
    )
    assert after == before


def test_streaming_schedule_priority_from_graph(spark, tmp_path):
    """schedule_graph_path: the batch schedule carries the webgraph's
    rank as a fetch-order priority; unscored URLs default to 0.0."""
    src = tmp_path / "crawl"
    src.mkdir()
    graph = str(tmp_path / "pagerank")
    spark.createDataFrame(
        [("http://x.example/next", 0.7)], "node string, rank double"
    ).write.parquet(graph)
    page = (
        f'<html><body><p>{GOOD_A}</p><a href="/next">n</a>'
        '<a href="/other">o</a></body></html>'
    ).encode()
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(page)),
    ])
    _drain(
        spark, src, tmp_path / "lake", tmp_path / "ckpt",
        outlinks_path=str(tmp_path / "edges"),
        schedule_path=str(tmp_path / "sched"),
        schedule_graph_path=graph,
    )
    sched = {
        r["url"]: r["priority"]
        for r in spark.read.parquet(str(tmp_path / "sched")).collect()
    }
    assert sched == {"http://x.example/next": 0.7, "http://x.example/other": 0.0}


def test_crawl_separates_intra_script_languages(spark, tmp_path):
    """The point of round-11's intra-script langid, end to end: a
    Russian and a Ukrainian page land in the lake with lang='ru' and
    lang='uk' (pre-round-11 both pooled as 'ru' — and before the
    multilingual_stopwords extension BOTH were dropped as gibberish:
    the naturalness gate knew no Cyrillic function words), while a
    Kazakh page — Cyrillic script, untabled language — quarantines at
    the naturalness gate: with no tabled function words there is no
    evidence it is natural language at all, and dropping beats
    entering the corpus mislabeled (tabling kk is the one-row fix)."""
    ru = ("ученые обнаружили что океан нагревается быстрее чем они "
          "думали и это будет проблемой для всех стран в ближайшие годы "
          "если не принять меры по сокращению выбросов")
    uk = ("вчені виявили що океан нагрівається швидше ніж вони думали "
          "і це буде проблемою для всіх країн у найближчі роки якщо не "
          "вжити заходів для скорочення викидів")
    kk = ("барлық адамдар тумысынан азат және қадір-қасиеті мен "
          "құқықтары тең болып дүниеге келеді оларға ақыл-парасат "
          "берілген сондықтан олар бір-бірімен туыстық бауырмалдық "
          "қарым-қатынас жасаулары тиіс")
    src = tmp_path / "crawl"
    src.mkdir()
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://ru.example/a", _http(_page(ru))),
        _warc_record("response", "http://uk.example/a", _http(_page(uk))),
        _warc_record("response", "http://kk.example/a", _http(_page(kk))),
    ])
    zh = ("科学家发现海洋变暖的速度比他们想象的要快这对所有国家来说都是"
          "一个问题因为气候变化的影响正在不断加剧而且没有任何放缓的迹象")
    ja = ("科学者たちは海洋が彼らの考えよりも速く温暖化していることを発見"
          "しましたこれはすべての国にとって大きな問題になると考えられます")
    _write_warc(src, "b.warc.gz", [
        _warc_record("response", "http://zh.example/a", _http(_page(zh))),
        _warc_record("response", "http://ja.example/a", _http(_page(ja))),
    ])
    _drain(spark, src, tmp_path / "lake", tmp_path / "ckpt")
    langs = {
        r["url"].split("//")[1].split(".")[0]: r["lang"]
        for r in spark.read.parquet(str(tmp_path / "lake")).collect()
    }
    # zh/ja pass through the unsegmented naturalness lane (pre-round-11
    # every CJK page failed the word-level rules structurally)
    # the crawl refines Han variants (the fixture is simplified)
    assert langs == {"ru": "ru", "uk": "uk", "zh": "zh-hans", "ja": "ja"}


def test_persist_model_scans_model_once_per_stream(spark, tmp_path):
    """persist_model=True (round-12 verdict ask #5): the NB gate's
    model frames are cached and materialized ONCE at stream setup, so
    the per-batch scoring joins read the cache — the model scan count
    is INDEPENDENT of how many batches the stream drains.  Pinned with
    an accumulator ticking inside the model frames' lineage: equal
    across a 1-batch and a 3-batch drain with persist_model=True, and
    strictly larger on a 3-batch drain without it."""
    from polygon_io_data_ingestion_pipeline_spark.operators.classify import (
        nb_load,
        nb_save,
        nb_train,
        nb_unpersist,
    )

    spammy = (
        "the cheap pills and the lucky prize of the winner in the draw "
        "are the offer of the day while the bonus of the deal is the "
        "gift of the spin and the jackpot of the club"
    )
    train = spark.createDataFrame(
        [("good", GOOD_A), ("good", GOOD_B)]
        + [("bad", spammy), ("bad", spammy)],
        "label string, text string",
    )
    nb_save(nb_train(train), str(tmp_path / "model"))

    def counting_model(acc):
        model = nb_load(spark, str(tmp_path / "model"))

        def wrap(df):
            schema = df.schema

            def tick(batches):
                for b in batches:
                    acc.add(len(b))
                    yield b

            return df.mapInPandas(tick, schema)

        return {name: wrap(frame) for name, frame in model.items()}

    def run(tag, n_batches, persist):
        src = tmp_path / f"crawl-{tag}"
        src.mkdir()
        for i in range(n_batches):
            _write_warc(src, f"{i}.warc.gz", [
                _warc_record(
                    "response", f"http://x.example/g{i}",
                    _http(_page(GOOD_A)),
                ),
            ])
        acc = spark.sparkContext.accumulator(0)
        model = counting_model(acc)
        _drain(
            spark, src, tmp_path / f"lake-{tag}", tmp_path / f"ckpt-{tag}",
            clf_model=model, persist_model=persist, max_files_per_trigger=1,
        )
        kept = spark.read.parquet(str(tmp_path / f"lake-{tag}")).count()
        assert kept == n_batches  # every good page kept, one per batch
        if persist:
            nb_unpersist(model)
        return acc.value

    one = run("p1", 1, persist=True)
    three = run("p3", 3, persist=True)
    plain = run("n3", 3, persist=False)
    assert one == three  # scan count independent of batch count
    assert plain > three  # the default re-reads per batch (leak-free)


def test_compact_edges_unit_pagerank_and_anchor_identity(spark, tmp_path):
    """compact_edges over a 20-batch outlinks root: folds every batch
    dir into one negative-id baseline and is OUTPUT-PRESERVING for the
    edge consumers — pagerank_directed and anchor_text_index return
    byte-identical rows before and after the fold (row-level distinct
    collapses only cross-batch re-fetch duplicates, which every
    consumer already ignores)."""
    import re

    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
        pagerank_directed,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.urls import (
        anchor_text_index,
    )
    from polygon_io_data_ingestion_pipeline_spark.streaming.crawl_stream import (
        compact_edges,
    )

    root = str(tmp_path / "edges")
    for b in range(20):
        rows = [
            # stable site chrome: the SAME edge row re-fetched every
            # batch (the duplication compaction collapses)
            ("http://x.example/home", "http://x.example/about",
             "about us", False),
            # per-batch fresh content edges
            (f"http://x.example/p{b}", "http://x.example/home",
             f"back home {b}", False),
            (f"http://x.example/p{b}", f"http://x.example/p{b + 1}",
             "next", False),
            # nofollow edge (excluded by both consumers)
            (f"http://x.example/p{b}", "http://ads.example/track",
             "ad", True),
        ]
        spark.createDataFrame(
            rows, "src string, dst string, anchor string, nofollow boolean"
        ).write.parquet(os.path.join(root, f"batch_id={b}"))

    def consume():
        e = spark.read.parquet(root)
        followed = (
            e.filter(~F.coalesce(F.col("nofollow"), F.lit(False)))
            .select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        pr = sorted(
            (r["node"], r["out_degree"], r["rank"])
            for r in pagerank_directed(followed, iters=2).collect()
        )
        anchors = sorted(
            (r["url"], r["in_refs"], tuple(r["anchors"]))
            for r in anchor_text_index(e, normalize=False).collect()
        )
        return pr, anchors

    before = consume()
    stats = compact_edges(spark, root, min_batch_dirs=16)
    assert stats == {"dirs_before": 20, "dirs_after": 1, "compacted": 20}
    dirs = [
        d for d in os.listdir(root) if re.fullmatch(r"batch_id=-?\d+", d)
    ]
    assert dirs == ["batch_id=-1"]
    assert consume() == before
    # the fold actually COLLAPSES cross-batch duplicates (round-12
    # review finding: the hive batch_id partition column must be
    # dropped before the distinct or every copy survives under its own
    # batch id) — the stable chrome edge is ONE row now, and the
    # baseline carries no embedded batch_id data column
    folded = spark.read.parquet(root)
    assert folded.drop("batch_id").schema.fieldNames() == [
        "src", "dst", "anchor", "nofollow",
    ]
    chrome = folded.filter(
        (F.col("src") == "http://x.example/home")
        & (F.col("dst") == "http://x.example/about")
    )
    assert chrome.count() == 1
    assert folded.count() == 1 + 20 * 3  # chrome + 3 fresh rows/batch
    # below-threshold second call is a no-op
    assert compact_edges(spark, root, min_batch_dirs=16)["compacted"] == 0
    # a crash-replayed batch dir next to the baseline: duplicates only
    spark.createDataFrame(
        [("http://x.example/home", "http://x.example/about",
          "about us", False)],
        "src string, dst string, anchor string, nofollow boolean",
    ).write.parquet(os.path.join(root, "batch_id=3"))
    assert consume() == before


def test_crawl_nfc_history_collapses_nfd_recrawl(spark, tmp_path):
    """normalize_form='NFC' (round 13): an NFD re-encoding of a page
    already in the lake is the same rendered text and must be caught by
    the exact-history fingerprint check — without the form both copies
    enter the lake forever."""
    import unicodedata

    nfc_text = GOOD_A + " café münchen"
    nfd_text = unicodedata.normalize("NFD", nfc_text)
    assert nfc_text != nfd_text

    src = tmp_path / "crawl"
    src.mkdir()
    lake, ckpt = tmp_path / "lake", tmp_path / "ckpt"
    _write_warc(src, "a.warc.gz", [
        _warc_record("response", "http://x.example/a", _http(_page(nfc_text))),
    ])
    _drain(spark, src, lake, ckpt, exact_history=True, normalize_form="NFC")
    _write_warc(src, "b.warc.gz", [
        _warc_record(
            "response", "http://mirror.example/a", _http(_page(nfd_text))
        ),
        _warc_record("response", "http://x.example/b", _http(_page(GOOD_B))),
    ])
    _drain(spark, src, lake, ckpt, exact_history=True, normalize_form="NFC")
    rows = spark.read.parquet(str(lake)).collect()
    assert sorted(r["url"] for r in rows) == [
        "http://x.example/a", "http://x.example/b",
    ]
