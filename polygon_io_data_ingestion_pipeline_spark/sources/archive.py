"""Archive sources for corpus ingestion: ZIP/tar bundles and WARC crawls.

Web-scale training corpora rarely arrive as loose files: they ship as
ZIP/tar bundles of documents or as WARC files (the Common Crawl
interchange format — concatenated gzip members, one crawl record each).
All unpack with the stdlib, so the explode-to-rows step runs as an
Arrow-batched ``mapInPandas`` over the file listing: one task per
archive, members/records streamed out as ordinary rows that the rest of
the pipeline (quality gates, dedup, JSONL/parquet sinks) consumes
unchanged.

Scale shape: archives, like gzip JSONL, are NOT splittable — read
parallelism equals the archive count, so shard large crawls into many
WARCs upstream (Common Crawl already does: ~1 GB per file).  Within a
task the walk is INCREMENTAL: the archive is read in bounded chunks
(never materialized whole), records/members are parsed from a rolling
buffer, and rows are emitted in bounded batches — peak task memory is
O(chunk + largest single record + one output batch), independent of
archive size, so one oversized crawl file degrades gracefully instead
of OOMing the executor.  Local and ``file:`` paths open directly;
other filesystems (s3/hdfs/gcs) route through ``pyarrow.fs`` chunked
streams.  Member payloads carry through as binary columns for
:mod:`..multimodal.binaryops` or decode to text here via
:func:`html_to_text` (charset-aware: HTTP header -> BOM -> ``<meta
charset>`` prescan -> utf-8, with ``charset``/``decode_ok`` columns so
mojibake is quarantinable instead of silently poisoning langid/quality/
dedup downstream).

No reference counterpart (`/root/reference` ingests CSV flat files
only) — this is beyond-reference corpus-ingestion surface.
"""

from __future__ import annotations

import codecs
import io
import re
import zipfile
import zlib
from collections.abc import Iterable, Iterator
from urllib.parse import urlparse
from urllib.request import url2pathname

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ZIP_SCHEMA = "archive string, member string, size bigint, payload binary"
WARC_SCHEMA = (
    "warc_file string, record_type string, url string, warc_date string, "
    "content_type string, http_status int, payload_digest string, "
    "payload binary"
)

_CHUNK = 1 << 20  # streaming read granularity
_BATCH_ROWS = 1024  # max rows per emitted Arrow batch
_BATCH_BYTES = 64 << 20  # max payload bytes per emitted Arrow batch


def _open_input(uri: str, seekable: bool = False):
    """Open a Spark file-listing URI for chunked reading.  Local /
    ``file:`` paths use plain ``open``; any other scheme goes through
    ``pyarrow.fs`` (s3/hdfs/gcs all speak ``from_uri``), keeping the
    readers cluster-portable without loading whole files like
    ``binaryFile``'s content column does."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        path = url2pathname(parsed.path) if parsed.scheme else uri
        return open(path, "rb")
    import pyarrow.fs as pafs

    fs, p = pafs.FileSystem.from_uri(uri)
    return fs.open_input_file(p) if seekable else fs.open_input_stream(p)


def _iter_chunks(fh, chunk: int = _CHUNK) -> Iterator[bytes]:
    while True:
        data = fh.read(chunk)
        if not data:
            return
        yield bytes(data)


def _list_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """File listing via the binaryFile source WITHOUT its content
    column: selecting only ``path`` prunes the payload read (the format
    materializes content lazily per required column), while keeping
    Spark's glob/recursion semantics and its size-aware packing of
    files into tasks."""
    return spark.read.format("binaryFile").load(path_glob).select("path")


class _BatchEmitter:
    """Accumulate rows and flush bounded pandas batches — the memory
    cap between the incremental archive walk and Arrow."""

    def __init__(self, columns: list[str], payload_col: str = "payload",
                 batch_rows: int = _BATCH_ROWS, batch_bytes: int = _BATCH_BYTES):
        self._columns = columns
        self._payload_col = payload_col
        self._batch_rows = batch_rows
        self._batch_bytes = batch_bytes
        self._reset()

    def _reset(self) -> None:
        self.cols: dict[str, list] = {c: [] for c in self._columns}
        self._nbytes = 0

    def add(self, row: dict) -> pd.DataFrame | None:
        for c in self._columns:
            self.cols[c].append(row[c])
        payload = row.get(self._payload_col)
        self._nbytes += len(payload) if payload else 0
        if (
            len(self.cols[self._columns[0]]) >= self._batch_rows
            or self._nbytes >= self._batch_bytes
        ):
            return self.flush()
        return None

    def flush(self) -> pd.DataFrame | None:
        if not self.cols[self._columns[0]]:
            return None
        out = pd.DataFrame(self.cols)
        self._reset()
        return out


def read_zip_members(
    spark: SparkSession,
    path_glob: str,
    suffix: str | None = None,
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
) -> DataFrame:
    """Explode ZIP archives into (archive, member, size, payload) rows.

    Directory entries are skipped; ``suffix`` (e.g. ``".txt"``)
    pre-filters members before their bytes are read, so a selective
    extract never inflates what it does not keep.  The archive is
    opened as a SEEKABLE stream (ZIP needs its central directory) and
    members decompress one at a time — peak memory is one member plus
    one output batch, not the archive.  Corrupt archives yield zero
    rows for that file instead of failing the task
    (quarantine-by-omission, consistent with the media codecs)."""
    files = _list_files(spark, path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emit = _BatchEmitter(
            ["archive", "member", "size", "payload"],
            batch_rows=batch_rows, batch_bytes=batch_bytes,
        )
        for batch in batches:
            for path in batch["path"]:
                try:
                    fh = _open_input(path, seekable=True)
                except OSError:
                    continue
                with fh:
                    try:
                        zf = zipfile.ZipFile(fh)
                        infos = zf.infolist()
                    except (zipfile.BadZipFile, OSError):
                        continue
                    for info in infos:
                        if info.is_dir():
                            continue
                        if suffix is not None and not info.filename.endswith(suffix):
                            continue
                        try:
                            data = zf.read(info)
                        except (zipfile.BadZipFile, zlib.error, OSError):
                            continue  # one corrupt member, not the archive
                        out = emit.add({
                            "archive": path, "member": info.filename,
                            "size": len(data), "payload": data,
                        })
                        if out is not None:
                            yield out
        tail = emit.flush()
        if tail is not None:
            yield tail

    return files.mapInPandas(run, schema=ZIP_SCHEMA)


def read_tar_members(
    spark: SparkSession,
    path_glob: str,
    suffix: str | None = None,
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
) -> DataFrame:
    """Explode tar / tar.gz / tar.bz2 / tar.xz archives into (archive,
    member, size, payload) rows — :func:`read_zip_members`'s twin for
    the other common bundle format.  Opened in ``tarfile``'s STREAMING
    mode (``r|*``: forward-only chunked reads, compression sniffed from
    the bytes), so a tar larger than executor memory walks member by
    member.  Non-regular members (dirs, links, devices) are skipped;
    corrupt archives quarantine to zero rows and a corrupt member ends
    that archive's extraction at the damage point (tar has no central
    directory to recover from)."""
    import tarfile

    files = _list_files(spark, path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emit = _BatchEmitter(
            ["archive", "member", "size", "payload"],
            batch_rows=batch_rows, batch_bytes=batch_bytes,
        )
        for batch in batches:
            for path in batch["path"]:
                try:
                    fh = _open_input(path)
                except OSError:
                    continue
                with fh:
                    try:
                        tf = tarfile.open(fileobj=fh, mode="r|*")
                    except (tarfile.TarError, OSError, EOFError):
                        continue
                    with tf:
                        try:
                            for info in tf:
                                if not info.isreg():
                                    continue
                                if suffix is not None and not info.name.endswith(suffix):
                                    continue
                                member = tf.extractfile(info)
                                if member is None:
                                    continue
                                data = member.read()
                                out = emit.add({
                                    "archive": path, "member": info.name,
                                    "size": len(data), "payload": data,
                                })
                                if out is not None:
                                    yield out
                        except (tarfile.TarError, OSError, EOFError, zlib.error):
                            pass  # damage point reached: keep what extracted
        tail = emit.flush()
        if tail is not None:
            yield tail

    return files.mapInPandas(run, schema=ZIP_SCHEMA)


# --- WARC ------------------------------------------------------------------


def _gunzip_stream(chunks: Iterable[bytes]) -> Iterator[bytes]:
    """Incrementally inflate concatenated gzip members (the .warc.gz
    layout: each record its own member, so range requests can start at
    any record).  Chunk in, chunk out — no member and no file is ever
    whole in memory; a mid-member EOF raises (truncated file)."""
    d = zlib.decompressobj(wbits=31)
    fed = False
    for chunk in chunks:
        pending = chunk
        while pending:
            out = d.decompress(pending)
            fed = True
            pending = b""
            if out:
                yield out
            if d.eof:
                pending = d.unused_data
                d = zlib.decompressobj(wbits=31)
                fed = False
    if fed and not d.eof:
        raise ValueError("truncated gzip member")


def _warc_records_from_chunks(
    chunks: Iterable[bytes],
) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per WARC record from an UNCOMPRESSED chunk
    stream.  Record framing per the spec: header block, CRLFCRLF,
    Content-Length payload bytes, CRLFCRLF separator.  The rolling
    buffer holds at most one record plus one chunk — the incremental
    contract that lets a single oversized WARC stream through a
    bounded-memory task."""
    it = iter(chunks)
    buf = bytearray()
    done = False

    def _need(n: int) -> None:
        nonlocal done
        while len(buf) < n and not done:
            nxt = next(it, None)
            if nxt is None:
                done = True
            else:
                buf.extend(nxt)

    while True:
        _need(2)
        while buf[:2] in (b"\r\n", b"\n\n"):
            del buf[:2]
            _need(2)
        if not buf and done:
            return
        while (head_end := buf.find(b"\r\n\r\n")) < 0:
            if done:
                raise ValueError("truncated WARC header")
            before = len(buf)
            _need(before + 1)
            if len(buf) == before:  # no more data
                raise ValueError("truncated WARC header")
        if not buf.startswith(b"WARC/"):
            raise ValueError("lost WARC record framing")
        headers: dict[str, str] = {}
        for line in buf[:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad WARC Content-Length: {e!r}") from e
        body_end = head_end + 4 + length
        _need(body_end)
        if len(buf) < body_end:
            raise ValueError("truncated WARC payload")
        yield headers, bytes(buf[head_end + 4 : body_end])
        del buf[:body_end]


def _parse_http_response(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) from an HTTP response block —
    the body of a WARC ``response`` (or ``revisit``) record."""
    if not body[:5] in (b"HTTP/", b"http/"):
        return None, None, body
    head_end = body.find(b"\r\n\r\n")
    sep_len = 4
    if head_end < 0:
        # bare-LF heads happen in the wild (non-compliant servers,
        # preserved verbatim by crawlers) — without this the envelope
        # never strips and the text/* filter silently drops the page
        head_end = body.find(b"\n\n")
        sep_len = 2
    if head_end < 0:
        return None, None, body
    status = None
    ctype = None
    lines = body[:head_end].decode("latin1").replace("\r\n", "\n").split("\n")
    parts = lines[0].split(None, 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if sep and k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, body[head_end + sep_len :]


def _warc_mapper(
    record_types: tuple[str, ...],
    batch_rows: int,
    batch_bytes: int,
):
    """The per-task WARC walk shared by :func:`read_warc` (batch) and
    the streaming crawl source: path rows in, record rows out in
    bounded batches."""
    keep = tuple(record_types)
    columns = [
        "warc_file", "record_type", "url", "warc_date",
        "content_type", "http_status", "payload_digest", "payload",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emit = _BatchEmitter(columns, batch_rows=batch_rows, batch_bytes=batch_bytes)
        for batch in batches:
            for path in batch["path"]:
                try:
                    fh = _open_input(path)
                except OSError:
                    continue
                with fh:
                    chunks = _iter_chunks(fh)
                    first = next(chunks, b"")
                    stream: Iterable[bytes] = (
                        c for src in ((first,), chunks) for c in src if c
                    )
                    if first[:2] == b"\x1f\x8b":
                        stream = _gunzip_stream(stream)
                    try:
                        for headers, body in _warc_records_from_chunks(stream):
                            rtype = headers.get("warc-type", "")
                            if keep and rtype not in keep:
                                continue
                            status, ctype, payload = (None, None, body)
                            if rtype in ("response", "revisit"):
                                status, ctype, payload = _parse_http_response(body)
                            out = emit.add({
                                "warc_file": path,
                                "record_type": rtype,
                                "url": headers.get("warc-target-uri"),
                                "warc_date": headers.get("warc-date"),
                                "content_type": ctype or headers.get("content-type"),
                                "http_status": status,
                                "payload_digest": headers.get("warc-payload-digest"),
                                "payload": payload,
                            })
                            if out is not None:
                                yield out
                    except (ValueError, zlib.error, OSError):
                        continue  # damage point: keep what parsed
        tail = emit.flush()
        if tail is not None:
            yield tail

    return run


def read_warc(
    spark: SparkSession,
    path_glob: str,
    record_types: tuple[str, ...] = ("response", "revisit"),
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
) -> DataFrame:
    """WARC / WARC.GZ crawls -> one row per record: (warc_file,
    record_type, url, warc_date, content_type, http_status,
    payload_digest, payload).

    ``response`` and ``revisit`` records get their HTTP envelope
    stripped — ``payload`` is the served document bytes (empty for
    revisits, whose whole point is "identical to an earlier fetch"),
    ``http_status``/``content_type`` come from the HTTP head (falling
    back to the WARC header).  ``payload_digest`` surfaces the
    crawler-computed ``WARC-Payload-Digest`` so exact dedup can run
    BEFORE any payload hashing or HTML parse (see
    :func:`warc_digest_dedup`); ``revisit`` records — the crawl's own
    duplicate markers — are kept by default for the same reason.  Pass
    ``record_types=()`` to keep every record type (request, metadata,
    warcinfo...).

    The file is gunzipped and parsed INCREMENTALLY (rolling buffer,
    bounded output batches) — a file corrupt at the head yields zero
    rows; damage mid-file keeps the records parsed before it, matching
    the tar reader's damage-point semantics."""
    return _list_files(spark, path_glob).mapInPandas(
        _warc_mapper(record_types, batch_rows, batch_bytes), schema=WARC_SCHEMA
    )


def read_wet(
    spark: SparkSession,
    path_glob: str,
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
) -> DataFrame:
    """Common Crawl WET files (the extracted-text sidecar format) ->
    one decoded document row per ``conversion`` record: (warc_file,
    url, warc_date, text, charset, decode_ok).

    WET is WARC framing with ``WARC-Type: conversion`` records whose
    payload is the ALREADY-extracted plain text of a page (no HTTP
    envelope; ``Content-Type: text/plain`` in the WARC header) — the
    cheapest entry point when the HTML walk has already been paid by
    the crawl provider.  Same bounded-memory walk and charset-aware
    decode lane as :func:`read_warc`; mojibake rows carry
    ``decode_ok=false`` for the standard quarantine accounting."""
    recs = read_warc(
        spark,
        path_glob,
        record_types=("conversion",),
        batch_rows=batch_rows,
        batch_bytes=batch_bytes,
    )
    return decode_text_members(recs).select(
        "warc_file", "url", "warc_date", "text", "charset", "decode_ok"
    )


def warc_digest_dedup(
    df: DataFrame,
    digest_col: str = "payload_digest",
    order_col: str = "warc_date",
) -> DataFrame:
    """Exact pre-dedup on the crawler-computed payload digest — FREE
    dedup that runs before any payload hashing or HTML parse, and the
    only dedup that can use ``revisit`` records (their payload is
    empty; the digest is the evidence).

    One representative per non-null digest: ``response`` records beat
    ``revisit`` markers (a revisit must never represent content it does
    not carry), then earliest ``order_col``, then url for determinism.
    Null-digest rows pass through untouched.  One hash shuffle on the
    digest; per-digest groups are duplicate sets (tiny), so the window
    never materializes a skewed partition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keyed = df.filter(F.col(digest_col).isNotNull())
    passthrough = df.filter(F.col(digest_col).isNull())
    w = Window.partitionBy(digest_col).orderBy(
        F.when(F.col("record_type") == "response", F.lit(0)).otherwise(F.lit(1)),
        F.col(order_col).asc_nulls_last(),
        F.col("url").asc_nulls_last(),
    )
    reps = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return reps.unionByName(passthrough)


# --- charset sniffing --------------------------------------------------------

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),  # utf-32 first: utf-16-le BOM is its prefix
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)
# WHATWG encoding-standard label remaps browsers apply: pages declaring
# ascii/latin1/iso-8859-1 are decoded as windows-1252 (its superset —
# bytes 0x80-0x9F are in real use on such pages), gb2312 as gbk.
_WHATWG_ALIASES = {
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "gb2312": "gbk",
}
_CHARSET_RE = re.compile(r"""charset\s*=\s*["']?\s*([\w!#$%&+.^`{}~:-]+)""", re.I)


def _normalize_charset(label: str) -> str | None:
    label = label.strip().strip("\"'").lower()
    label = _WHATWG_ALIASES.get(label, label)
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def sniff_charset(payload: bytes, content_type: str | None = None) -> tuple[str, str]:
    """(codec, source) for an HTML/text payload.  Priority: BOM (the
    bytes outrank any label), HTTP ``Content-Type`` charset parameter,
    ``<meta charset>`` / ``http-equiv`` prescan of the first 4 KiB
    (decoded latin1 — ASCII-compatible, enough for the attribute), then
    the utf-8 default.  source in {"bom","header","meta","default"}."""
    for bom, name in _BOMS:
        if payload.startswith(bom):
            return name, "bom"
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            c = _normalize_charset(m.group(1))
            if c:
                return c, "header"
    m = _CHARSET_RE.search(payload[:4096].decode("latin1", "replace"))
    if m:
        c = _normalize_charset(m.group(1))
        if c:
            return c, "meta"
    return "utf-8", "default"


def _decode_payload(
    payload: bytes, content_type: str | None
) -> tuple[str, str, bool]:
    """(text, charset, decode_ok).  The sniffed charset is tried STRICT
    — a declared-but-wrong label falls back to strict utf-8, then to
    utf-8/replace with ``decode_ok=False``, so mojibake is a flagged,
    quarantinable condition instead of silent corruption."""
    enc, source = sniff_charset(payload, content_type)
    data = payload
    if source == "bom" and enc != "utf-8-sig":
        # the endian-specific utf-16/32 codecs do NOT strip the BOM
        # (only the auto-detecting "utf-16"/"utf-8-sig" do) — drop it
        # here or every BOM'd page leads with U+FEFF
        for bom, name in _BOMS:
            if name == enc and payload.startswith(bom):
                data = payload[len(bom):]
                break
    try:
        return data.decode(enc), enc, True
    except (UnicodeDecodeError, ValueError):
        pass
    if enc not in ("utf-8", "utf-8-sig"):
        try:
            return data.decode("utf-8"), "utf-8", True
        except UnicodeDecodeError:
            pass
    return data.decode("utf-8", "replace"), "utf-8", False


# --- HTML -> text ----------------------------------------------------------

_SKIP_TAGS = {"script", "style", "template", "noscript"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "table", "ul", "ol",
}
# structural boilerplate containers + the class/id/role vocabulary of
# site chrome (nav bars, cookie banners, share widgets, comment chrome)
_BOILER_TAGS = {"nav", "aside", "footer", "form"}
_BOILER_HINT = re.compile(
    r"nav|menu|footer|sidebar|banner|cookie|consent|breadcrumb|share|"
    r"social|comment|related|widget|promo|advert",
    re.I,
)
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "source", "track", "wbr",
}
# inline formatting elements: a stray close of one of these must NOT
# pop through a structural container (browsers run the adoption agency
# instead of closing the container; we approximate by ignoring the
# misnested close), while a stray close of a STRUCTURAL tag still
# auto-closes unclosed inners (the <li>/<p>/unclosed-<div> case)
_FORMATTING_TAGS = {
    "a", "abbr", "b", "big", "code", "em", "font", "i", "mark", "s",
    "small", "span", "strong", "sub", "sup", "u",
}


def _extract_blocks(html: str) -> list[tuple[str, int, bool]]:
    """Visible text of an HTML document as scored blocks:
    ``(text, link_chars, boiler)`` per block (one block per run of text
    between block-level tags, whitespace collapsed).  ``link_chars``
    counts characters inside ``<a>`` (link density is the classic
    boilerplate signal); ``boiler`` marks text inside structural chrome
    (nav/aside/footer/form or class/id hints).  Stdlib only —
    script/style/template subtrees dropped."""
    from html.parser import HTMLParser

    class _Blocks(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.blocks: list[tuple[str, int, bool]] = []
            self.cur: list[str] = []
            self.cur_link = 0
            self.cur_boiler = False
            self.skip = 0
            self.link_depth = 0
            # browser-style scoping: open_tags is the stack of ALL open
            # non-void elements; boiler_depths records the open_tags
            # length at which each active boiler scope began.  A close
            # pops through unclosed inners to the nearest matching open
            # element (HTML auto-close), and a boiler scope retires the
            # moment the element stack shrinks past its depth — so a
            # plain <div> inside <div class="nav"> cannot end the scope
            # at its own </div>, and an UNCLOSED inner same-name element
            # leaks the scope only until the nearest properly-closed
            # ancestor (not to end-of-document, as per-name counting
            # would).
            self.open_tags: list[str] = []
            self.boiler_depths: list[int] = []

        def _flush(self):
            text = " ".join("".join(self.cur).split())
            if text:
                self.blocks.append((text, self.cur_link, self.cur_boiler))
            self.cur, self.cur_link = [], 0
            self.cur_boiler = bool(self.boiler_depths)

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP_TAGS:
                self.skip += 1
                return
            if tag in _BLOCK_TAGS:
                self._flush()
            if tag == "a":
                self.link_depth += 1
            if tag == "main":
                # a page has one <main> and it is never chrome: treat it
                # as an authoritative main-content signal that recovers
                # from any boiler scope left open by unbalanced markup.
                # Flush FIRST — text accumulated inside the (still-open)
                # chrome scope must ship as boiler, not inherit the
                # cleared state at the next block tag
                self._flush()
                self.boiler_depths.clear()
                self.cur_boiler = False
            if tag not in _VOID_TAGS:
                self.open_tags.append(tag)
                if tag in _BOILER_TAGS or any(
                    k in ("class", "id", "role") and v and _BOILER_HINT.search(v)
                    for k, v in attrs
                ):
                    self.boiler_depths.append(len(self.open_tags))
                    self.cur_boiler = True

        def handle_endtag(self, tag):
            if tag in _SKIP_TAGS:
                if self.skip:
                    self.skip -= 1
                return
            if tag == "a" and self.link_depth:
                self.link_depth -= 1
            # pop BEFORE the block flush so the flush's reset reads the
            # post-close scope state (text between a closed boiler
            # container and the next block tag is NOT chrome)
            for i in range(len(self.open_tags) - 1, -1, -1):
                t = self.open_tags[i]
                if t == tag:
                    del self.open_tags[i:]
                    while self.boiler_depths and self.boiler_depths[-1] > len(
                        self.open_tags
                    ):
                        self.boiler_depths.pop()
                    break
                if tag in _FORMATTING_TAGS and t not in _FORMATTING_TAGS:
                    # a misnested inline close ('</b>' opened before a
                    # still-open <div class=nav>) must not auto-close
                    # the structural container — ignore it
                    break
            if tag in _BLOCK_TAGS:
                self._flush()

        def handle_data(self, data):
            if self.skip:
                return
            self.cur.append(data)
            if self.boiler_depths:
                self.cur_boiler = True
            if self.link_depth:
                self.cur_link += len(" ".join(data.split()))

    p = _Blocks()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # best effort on malformed markup; keep what parsed
    p._flush()
    return p.blocks


def _extract_text(html: str) -> str:
    """ALL visible text of an HTML document (block boundaries become
    newlines, whitespace collapses) — the keep-everything variant;
    :func:`_extract_main_text` is the boilerplate-stripped one."""
    return "\n".join(text for text, _, _ in _extract_blocks(html))


def _keep_block(text: str, link_chars: int, boiler: bool) -> bool:
    if boiler:
        return False
    density = link_chars / max(len(text), 1)
    if density > 0.5:
        return False  # a run of links is navigation, whatever it's called
    # short link-bearing stubs ("Home", "Next >") are chrome; short
    # plain text (headlines, captions) stays
    if len(text) < 25 and link_chars > 0:
        return False
    return True


def _extract_main_text(html: str) -> str:
    """Main-content text: the :func:`_extract_blocks` walk with
    boilerplate dropped by the CCNet/trafilatura-lineage signals —
    structural chrome containers, chrome class/id vocabulary, and
    link-density block scoring.  Body text survives verbatim; nav bars,
    footers, cookie banners, share/comment widgets do not."""
    return "\n".join(
        text for text, link_chars, boiler in _extract_blocks(html)
        if _keep_block(text, link_chars, boiler)
    )


def _decoded_text_column(
    df: DataFrame,
    extract,
    payload_col: str,
    out_col: str,
    content_type_col: str | None,
) -> DataFrame:
    """Shared Arrow-batched decode lane: charset-sniffed strict decode
    (-> ``charset``/``decode_ok`` columns), then ``extract`` (identity
    for plain text, the HTML walks for pages).  ``%PDF-`` payloads are
    magic-sniffed FIRST and route through the baseline PDF text codec
    (:mod:`...multimodal.pdf`) — charset-decoding PDF bytes would only
    produce mojibake; extracted documents report ``charset='pdf'``,
    quarantined ones (encrypted, exotic filters, CID fonts) come back
    NULL with ``decode_ok=false``, the same accounting as mojibake.
    ZIP-magic payloads that are Office documents (DOCX/ODT — sniffed by
    container member, :mod:`...multimodal.docx`) route the same way
    with ``charset='docx'``/``'odt'``; any OTHER zip falls through to
    the charset lane (zip BUNDLES belong to the archive source, which
    explodes members before this lane sees them)."""
    from ..multimodal.docx import OfficeFormatError, try_extract_office
    from ..multimodal.pdf import PdfFormatError, extract_pdf_text

    if content_type_col is None and "content_type" in df.columns:
        content_type_col = "content_type"
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} string, charset string, decode_ok boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            texts, charsets, oks = [], [], []
            ctypes = (
                batch[content_type_col]
                if content_type_col is not None
                else [None] * len(batch)
            )
            for p, ct in zip(batch[payload_col], ctypes):
                if p is None:
                    texts.append(None)
                    charsets.append(None)
                    oks.append(None)
                    continue
                if bytes(p[:5]) == b"%PDF-":
                    try:
                        texts.append(extract_pdf_text(bytes(p)))
                        oks.append(True)
                    except Exception:  # PdfFormatError + parser surprises
                        texts.append(None)
                        oks.append(False)
                    charsets.append("pdf")
                    continue
                if bytes(p[:4]) == b"PK\x03\x04":
                    # ONE container open for sniff + extraction
                    try:
                        got = try_extract_office(bytes(p))
                    except OfficeFormatError as e:
                        texts.append(None)
                        oks.append(False)
                        charsets.append(getattr(e, "kind", "office"))
                        continue
                    if got is not None:
                        kind, text = got
                        texts.append(text)
                        oks.append(True)
                        charsets.append(kind)
                        continue
                    # a plain zip: fall through to the charset lane
                try:
                    raw, enc, ok = _decode_payload(
                        bytes(p), ct if isinstance(ct, str) else None
                    )
                    texts.append(extract(raw))
                    charsets.append(enc)
                    oks.append(ok)
                except Exception:
                    texts.append(None)
                    charsets.append(None)
                    oks.append(None)
            batch = batch.copy()
            batch[out_col] = texts
            batch["charset"] = charsets
            batch["decode_ok"] = oks
            yield batch

    return df.mapInPandas(run, schema=schema)


def decode_text_members(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "text",
    content_type_col: str | None = None,
) -> DataFrame:
    """Plain-text member payloads -> decoded text plus ``charset`` and
    ``decode_ok``: :func:`html_to_text`'s charset-aware decode (BOM ->
    declared charset -> ``<meta>``/BOM prescan -> utf-8) WITHOUT the
    HTML extraction — for ZIP/tar bundle members and non-HTML crawl
    records, which a blind ``cast("string")`` would mojibake exactly
    like the WARC path used to."""
    return _decoded_text_column(
        df, lambda raw: raw, payload_col, out_col, content_type_col
    )


def html_to_text(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "text",
    content_type_col: str | None = None,
    main_content: bool = False,
) -> DataFrame:
    """Binary HTML payloads -> visible text column plus ``charset`` and
    ``decode_ok`` (Arrow-batched ``mapInPandas`` — the parser is
    per-document Python, so it rides the same batched lane as the media
    codecs, never row-at-a-time).

    The decode is charset-aware: BOM, then the HTTP ``Content-Type``
    charset (``content_type_col``, auto-detected when the frame has a
    ``content_type`` column — the WARC reader always does), then a
    ``<meta charset>`` prescan, then utf-8.  ``decode_ok=false`` rows
    decoded lossily (replacement characters) and are quarantinable
    before they poison langid/quality/dedup.  ``main_content=True``
    additionally strips boilerplate blocks (nav/footer/cookie-banner
    chrome) via link-density block scoring.  Undecodable/unparseable
    payloads yield NULL text (quarantine rows)."""
    extract = _extract_main_text if main_content else _extract_text
    return _decoded_text_column(df, extract, payload_col, out_col, content_type_col)


# --- HTML -> outlinks -------------------------------------------------------


def _extract_links(html: str, base_url: str | None) -> list[tuple[str, str, bool]]:
    """Every ``<a href>`` of an HTML document as
    ``(absolute_url, anchor_text, nofollow)``: hrefs resolve against
    the page URL (or a ``<base href>`` when the document declares one —
    first wins, per the HTML spec), ``rel`` values containing
    ``nofollow`` flag the link, and non-web schemes (``mailto:``,
    ``javascript:``, ``tel:`` ...) plus same-page fragment links drop.

    Resolution runs here in the walk (``urllib.parse.urljoin``) rather
    than as a column expression because RELATIVE resolution — ``../``
    collapsing, directory-relative paths, query-only hrefs — is RFC
    3986 merge logic that ``try_parse_url`` (an absolute-URL parser)
    cannot express; the walk is already per-document Python on the
    Arrow-batched lane, so the join is free."""
    from html.parser import HTMLParser
    from urllib.parse import urljoin

    class _Links(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.links: list[tuple[str, str, bool]] = []
            self.base: str | None = None
            self.skip = 0
            self.cur: tuple[str, bool] | None = None  # (href, nofollow)
            self.cur_text: list[str] = []

        def _finish(self):
            if self.cur is not None:
                href, nofollow = self.cur
                text = " ".join("".join(self.cur_text).split())
                self.links.append((href, text, nofollow))
            self.cur, self.cur_text = None, []

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP_TAGS:
                self.skip += 1
                return
            if tag == "base" and self.base is None:
                href = dict(attrs).get("href")
                if href:
                    self.base = href
            if tag == "a":
                # browsers auto-close an open <a> at the next <a>
                self._finish()
                a = dict(attrs)
                href = a.get("href")
                if href:
                    rel = (a.get("rel") or "").lower()
                    self.cur = (href, "nofollow" in rel)

        def handle_endtag(self, tag):
            if tag in _SKIP_TAGS:
                if self.skip:
                    self.skip -= 1
                return
            if tag == "a":
                self._finish()

        def handle_data(self, data):
            if self.skip:
                return
            if self.cur is not None:
                self.cur_text.append(data)

    p = _Links()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # best effort on malformed markup; keep what parsed
    p._finish()

    base = p.base or base_url or ""
    if p.base and base_url:
        # a relative <base href> itself resolves against the page URL
        base = urljoin(base_url, p.base)
    out: list[tuple[str, str, bool]] = []
    for href, text, nofollow in p.links:
        href = href.strip()
        if not href or href.startswith("#"):
            continue  # same-page fragment
        try:
            absu = urljoin(base, href)
        except ValueError:
            continue
        if not absu.lower().startswith(("http://", "https://")):
            continue  # mailto:, javascript:, tel:, data:, ...
        out.append((absu, text, nofollow))
    return out


def extract_outlinks(
    df: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    content_type_col: str | None = None,
) -> DataFrame:
    """Binary HTML page rows -> one row per outlink:
    ``(src, dst, anchor, nofollow)`` with ``dst`` absolutized against
    the page URL / ``<base href>`` — the edge list of the web link
    graph.  Charset-aware decode (same BOM > header > meta > utf-8
    cascade as :func:`html_to_text`); undecodable or unparseable pages
    contribute no edges.

    Scale shape: map-side only (Arrow-batched ``mapInPandas``, one
    parse per page, rows fan out within the task) — no shuffle; feed
    the result to ``operators/graph.py:pagerank`` for centrality or to
    ``operators/urls.py:crawl_frontier`` for the fetch frontier."""
    if content_type_col is None and "content_type" in df.columns:
        content_type_col = "content_type"
    schema = "src string, dst string, anchor string, nofollow boolean"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            src, dst, anchor, nofollow = [], [], [], []
            ctypes = (
                batch[content_type_col]
                if content_type_col is not None
                else [None] * len(batch)
            )
            for p, u, ct in zip(batch[payload_col], batch[url_col], ctypes):
                if p is None:
                    continue
                try:
                    raw, _enc, _ok = _decode_payload(
                        bytes(p), ct if isinstance(ct, str) else None
                    )
                    links = _extract_links(raw, u)
                except Exception:
                    continue
                for absu, text, nf in links:
                    src.append(u)
                    dst.append(absu)
                    anchor.append(text)
                    nofollow.append(nf)
            yield pd.DataFrame(
                {"src": src, "dst": dst, "anchor": anchor, "nofollow": nofollow}
            )

    return df.mapInPandas(run, schema=schema)


# --- HTML -> page metadata ---------------------------------------------------


def _extract_page_meta(html: str, base_url: str | None) -> dict:
    """Head metadata of an HTML document: ``title``, ``meta
    description``, canonical URL (resolved against the page URL /
    ``<base href>``), the ``<html lang>`` attribute, and the robots
    meta directives (``noindex``/``nofollow``) — the page-level
    counterparts of robots.txt (``noindex`` pages must drop from a
    compliant corpus, ``canonical`` collapses syndicated copies ahead
    of content dedup, declared ``lang`` cross-checks langid)."""
    from html.parser import HTMLParser
    from urllib.parse import urljoin

    class _Meta(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.title: str | None = None
            self.in_title = 0
            self.title_parts: list[str] = []
            self.description: str | None = None
            self.canonical: str | None = None
            self.lang: str | None = None
            self.noindex = False
            self.nofollow = False
            self.base: str | None = None

        def handle_starttag(self, tag, attrs):
            a = dict(attrs)
            if tag == "html" and self.lang is None:
                self.lang = a.get("lang") or None
            elif tag == "base" and self.base is None and a.get("href"):
                self.base = a["href"]
            elif tag == "title" and self.title is None:
                self.in_title += 1
            elif tag == "meta":
                name = (a.get("name") or a.get("property") or "").lower()
                content = a.get("content")
                if name == "description" and content and self.description is None:
                    self.description = " ".join(content.split())
                elif name == "robots" and content:
                    vals = {v.strip().lower() for v in content.split(",")}
                    self.noindex = self.noindex or "noindex" in vals or "none" in vals
                    self.nofollow = self.nofollow or "nofollow" in vals or "none" in vals
            elif tag == "link":
                rels = (a.get("rel") or "").lower().split()
                if "canonical" in rels and a.get("href") and self.canonical is None:
                    self.canonical = a["href"]

        def handle_endtag(self, tag):
            if tag == "title" and self.in_title:
                self.in_title = 0
                if self.title is None:
                    self.title = " ".join("".join(self.title_parts).split()) or None

        def handle_data(self, data):
            if self.in_title:
                self.title_parts.append(data)

    p = _Meta()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # best effort on malformed markup; keep what parsed
    if p.in_title and p.title is None:  # unclosed <title>
        p.title = " ".join("".join(p.title_parts).split()) or None
    canonical = None
    if p.canonical:
        base = base_url or ""
        if p.base:
            base = urljoin(base_url or "", p.base)
        try:
            resolved = urljoin(base, p.canonical.strip())
            if resolved.lower().startswith(("http://", "https://")):
                canonical = resolved
        except ValueError:
            canonical = None
    return {
        "title": p.title,
        "meta_description": p.description,
        "canonical_url": canonical,
        "html_lang": p.lang,
        "meta_noindex": p.noindex,
        "meta_nofollow": p.nofollow,
    }


def extract_page_meta(
    df: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    content_type_col: str | None = None,
) -> DataFrame:
    """Binary HTML page rows -> the input columns plus ``title``,
    ``meta_description``, ``canonical_url`` (absolutized),
    ``html_lang``, ``meta_noindex``, ``meta_nofollow``.

    A compliant corpus drops ``meta_noindex`` pages (the page-level
    robots channel), collapses ``canonical_url`` groups ahead of
    content dedup (syndicated copies declare the same canonical), and
    cross-checks ``html_lang`` against the statistical langid.  Same
    Arrow-batched charset-aware lane as :func:`html_to_text` /
    :func:`extract_outlinks`; undecodable pages yield NULL metadata."""
    if content_type_col is None and "content_type" in df.columns:
        content_type_col = "content_type"
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = (
        f"{out_fields}, title string, meta_description string, "
        "canonical_url string, html_lang string, "
        "meta_noindex boolean, meta_nofollow boolean"
    )
    cols = [
        "title", "meta_description", "canonical_url", "html_lang",
        "meta_noindex", "meta_nofollow",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas: list[dict] = []
            ctypes = (
                batch[content_type_col]
                if content_type_col is not None
                else [None] * len(batch)
            )
            for p, u, ct in zip(batch[payload_col], batch[url_col], ctypes):
                if p is None:
                    metas.append({})
                    continue
                try:
                    raw, _enc, _ok = _decode_payload(
                        bytes(p), ct if isinstance(ct, str) else None
                    )
                    metas.append(_extract_page_meta(raw, u))
                except Exception:
                    metas.append({})
            batch = batch.copy()
            for c in cols:
                batch[c] = [m.get(c) for m in metas]
            yield batch

    return df.mapInPandas(run, schema=schema)
