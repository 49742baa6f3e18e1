"""Archive sources for corpus ingestion: ZIP bundles and WARC crawls.

Web-scale training corpora rarely arrive as loose files: they ship as
ZIP/tar bundles of documents or as WARC files (the Common Crawl
interchange format — concatenated gzip members, one crawl record each).
Both unpack with the stdlib, so the explode-to-rows step runs as an
Arrow-batched ``mapInPandas`` over Spark's ``binaryFile`` source: one
task per archive, members/records streamed out as ordinary rows that
the rest of the pipeline (quality gates, dedup, JSONL/parquet sinks)
consumes unchanged.

Scale shape: archives, like gzip JSONL, are NOT splittable — read
parallelism equals the archive count, so shard large crawls into many
WARCs upstream (Common Crawl already does: ~1 GB per file).  The
``binaryFile`` scan loads one whole archive per task; keep archive
size under executor memory or re-shard first.  Member payloads carry
through as binary columns for :mod:`..multimodal.binaryops` or decode
to text here via :func:`html_to_text`.

No reference counterpart (`/root/reference` ingests CSV flat files
only) — this is beyond-reference corpus-ingestion surface.
"""

from __future__ import annotations

import io
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ZIP_SCHEMA = "archive string, member string, size bigint, payload binary"
WARC_SCHEMA = (
    "warc_file string, record_type string, url string, warc_date string, "
    "content_type string, http_status int, payload binary"
)


def read_zip_members(
    spark: SparkSession, path_glob: str, suffix: str | None = None
) -> DataFrame:
    """Explode ZIP archives into (archive, member, size, payload) rows.

    Directory entries are skipped; ``suffix`` (e.g. ``".txt"``)
    pre-filters members before their bytes are read, so a selective
    extract never inflates what it does not keep.  Corrupt archives
    yield zero rows for that file instead of failing the task
    (quarantine-by-omission, consistent with the media codecs)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"archive": [], "member": [], "size": [], "payload": []}
            for path, content in zip(batch["path"], batch["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(content))
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
                    out["archive"].append(path)
                    out["member"].append(info.filename)
                    out["size"].append(len(data))
                    out["payload"].append(data)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(run, schema=ZIP_SCHEMA)


# --- WARC ------------------------------------------------------------------


_GZ_CHUNK = 1 << 20


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Split concatenated gzip members (the .warc.gz layout: each record
    its own member, so range requests can start at any record).

    Input is fed in bounded windows: handing zlib the whole remaining
    buffer per member would make the split quadratic in file size (a
    Common Crawl file holds tens of thousands of members, and both the
    slice and ``unused_data`` would copy the ~whole tail every time);
    chunked feeding bounds the per-member overhead to one chunk."""
    view = memoryview(data)
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        parts = []
        p = pos
        while not d.eof:
            if p >= len(data):
                raise ValueError("truncated gzip member")
            window = view[p : p + _GZ_CHUNK]
            parts.append(d.decompress(window))
            p += len(window)
        yield b"".join(parts)
        new_pos = p - len(d.unused_data)  # unused tail <= one chunk
        if new_pos <= pos:
            raise ValueError("gzip member made no progress")
        pos = new_pos


def _split_warc_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per WARC record in an UNCOMPRESSED stream.
    Record framing per the spec: header block, CRLFCRLF, Content-Length
    payload bytes, CRLFCRLF separator."""
    pos = 0
    while pos < len(blob):
        while pos < len(blob) and blob[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= len(blob):
            return
        if not blob[pos : pos + 5] == b"WARC/":
            raise ValueError("lost WARC record framing")
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated WARC header")
        headers: dict[str, str] = {}
        for line in blob[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad WARC Content-Length: {e!r}") from e
        body_start = head_end + 4
        yield headers, blob[body_start : body_start + length]
        pos = body_start + length


def _parse_http_response(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) from an HTTP response block —
    the body of a WARC ``response`` record."""
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


def read_warc(
    spark: SparkSession, path_glob: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """WARC / WARC.GZ crawls -> one row per record: (warc_file,
    record_type, url, warc_date, content_type, http_status, payload).

    ``response`` records get their HTTP envelope stripped — ``payload``
    is the served document bytes, ``http_status``/``content_type`` come
    from the HTTP head (falling back to the WARC header).  Pass
    ``record_types=()`` to keep every record type (request, metadata,
    warcinfo...).  Corrupt files yield zero rows (quarantine), matching
    the ZIP reader."""
    files = spark.read.format("binaryFile").load(path_glob)
    keep = tuple(record_types)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            cols: dict[str, list] = {
                "warc_file": [], "record_type": [], "url": [], "warc_date": [],
                "content_type": [], "http_status": [], "payload": [],
            }
            for path, content in zip(batch["path"], batch["content"]):
                try:
                    blob = (
                        b"".join(_gzip_members(bytes(content)))
                        if bytes(content[:2]) == b"\x1f\x8b"
                        else bytes(content)
                    )
                    records = list(_split_warc_records(blob))
                except (ValueError, zlib.error):
                    continue  # corrupt crawl file: quarantine
                for headers, body in records:
                    rtype = headers.get("warc-type", "")
                    if keep and rtype not in keep:
                        continue
                    status, ctype, payload = (None, None, body)
                    if rtype == "response":
                        status, ctype, payload = _parse_http_response(body)
                    cols["warc_file"].append(path)
                    cols["record_type"].append(rtype)
                    cols["url"].append(headers.get("warc-target-uri"))
                    cols["warc_date"].append(headers.get("warc-date"))
                    cols["content_type"].append(
                        ctype or headers.get("content-type")
                    )
                    cols["http_status"].append(status)
                    cols["payload"].append(payload)
            yield pd.DataFrame(cols)

    return files.select("path", "content").mapInPandas(run, schema=WARC_SCHEMA)


# --- HTML -> text ----------------------------------------------------------


def _extract_text(html: str) -> str:
    """Visible text of an HTML document, stdlib only: script/style/
    template subtrees dropped, block boundaries become newlines, runs
    of whitespace collapse."""
    from html.parser import HTMLParser

    _SKIP = {"script", "style", "template", "noscript"}
    _BLOCK = {
        "p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
        "section", "article", "header", "footer", "table", "ul", "ol",
    }

    class _Text(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP:
                self.skip += 1
            elif tag in _BLOCK:
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in _SKIP and self.skip:
                self.skip -= 1
            elif tag in _BLOCK:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    p = _Text()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # best effort on malformed markup; keep what parsed
    lines = [" ".join(seg.split()) for seg in "".join(p.parts).split("\n")]
    return "\n".join(ln for ln in lines if ln)


def html_to_text(
    df: DataFrame, payload_col: str = "payload", out_col: str = "text"
) -> DataFrame:
    """Binary HTML payloads -> visible text column (Arrow-batched
    ``mapInPandas`` — the parser is per-document Python, so it rides
    the same batched lane as the media codecs, never row-at-a-time).
    Undecodable payloads yield NULL text (quarantine rows)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            texts = []
            for p in batch[payload_col]:
                if p is None:
                    texts.append(None)
                    continue
                try:
                    texts.append(_extract_text(bytes(p).decode("utf-8", "replace")))
                except Exception:
                    texts.append(None)
            batch = batch.copy()
            batch[out_col] = texts
            yield batch

    return df.mapInPandas(run, schema=schema)


def read_tar_members(
    spark: SparkSession, path_glob: str, suffix: str | None = None
) -> DataFrame:
    """Explode tar / tar.gz / tar.bz2 / tar.xz archives into (archive,
    member, size, payload) rows — :func:`read_zip_members`'s twin for
    the other common bundle format (``tarfile`` sniffs the compression
    from the bytes).  Non-regular members (dirs, links, devices) are
    skipped; corrupt archives quarantine to zero rows and a corrupt
    member ends that archive's extraction at the damage point (tar has
    no central directory to recover from)."""
    import tarfile

    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"archive": [], "member": [], "size": [], "payload": []}
            for path, content in zip(batch["path"], batch["content"]):
                try:
                    tf = tarfile.open(fileobj=io.BytesIO(content), mode="r:*")
                except (tarfile.TarError, OSError, EOFError):
                    continue
                with tf:
                    try:
                        for info in tf:
                            if not info.isreg():
                                continue
                            if suffix is not None and not info.name.endswith(suffix):
                                continue
                            fh = tf.extractfile(info)
                            if fh is None:
                                continue
                            data = fh.read()
                            out["archive"].append(path)
                            out["member"].append(info.name)
                            out["size"].append(len(data))
                            out["payload"].append(data)
                    except (tarfile.TarError, OSError, EOFError, zlib.error):
                        pass  # damage point reached: keep what extracted
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(run, schema=ZIP_SCHEMA)
