"""Property tests for the round-8 crawl surfaces.

- WARC chunk invariance: the incremental record parser must produce
  IDENTICAL records no matter how the byte stream is sliced into
  chunks — the property the bounded-memory walk's correctness rests on.
- Gzip-member stream invariance: same for the incremental gunzip.
- PSL: the statically-unrolled Spark expression must agree with an
  INDEPENDENT pure-Python implementation of the PSL algorithm over the
  same snapshot, on hosts assembled from adversarial label mixes.
"""

from __future__ import annotations

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
    _gunzip_stream,
    _warc_records_from_chunks,
)


def _warc_record(url: str, body: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _chunks_of(blob: bytes, cuts: list[int]):
    points = sorted({min(c, len(blob)) for c in cuts})
    prev = 0
    for p in points:
        if p > prev:
            yield blob[prev:p]
            prev = p
    if prev < len(blob):
        yield blob[prev:]


@settings(max_examples=60, deadline=None)
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=8),
    cuts=st.lists(st.integers(min_value=1, max_value=4000), max_size=12),
)
def test_warc_parse_is_chunking_invariant(bodies, cuts):
    blob = b"".join(
        _warc_record(f"http://x.example/{i}", b) for i, b in enumerate(bodies)
    )
    whole = list(_warc_records_from_chunks([blob]))
    sliced = list(_warc_records_from_chunks(_chunks_of(blob, cuts)))
    assert [(h["warc-target-uri"], p) for h, p in whole] == [
        (h["warc-target-uri"], p) for h, p in sliced
    ]
    assert [p for _h, p in whole] == bodies


@settings(max_examples=60, deadline=None)
@given(
    members=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=6),
    cuts=st.lists(st.integers(min_value=1, max_value=3000), max_size=10),
)
def test_gunzip_stream_is_chunking_invariant(members, cuts):
    blob = b"".join(gzip.compress(m) for m in members)
    out = b"".join(_gunzip_stream(_chunks_of(blob, cuts)))
    assert out == b"".join(members)


# --- PSL vs independent reference ---------------------------------------------


def _psl_reference(host: str) -> str | None:
    """Direct implementation of the PSL algorithm over the SAME parsed
    snapshot — longest matching rule (wildcards consume one extra
    label, exceptions win and shrink by one), default rule 1 label,
    registrable = public suffix + 1 label."""
    import re

    from polygon_io_data_ingestion_pipeline_spark.functions.psl import (
        _EXACT,
        _EXCEPTION,
        _WILDCARD,
    )

    host = host.lower()
    if re.match(r"^\d{1,3}(\.\d{1,3}){3}$", host):
        return None
    labels = host.split(".")
    n = len(labels)
    ps = 1
    for i in range(1, n + 1):
        suffix = ".".join(labels[n - i :])
        if suffix in {r for rs in _EXACT.values() for r in rs}:
            ps = max(ps, i)
        if suffix in {r for rs in _WILDCARD.values() for r in rs} and n > i:
            ps = max(ps, i + 1)
    for i in range(1, n + 1):
        suffix = ".".join(labels[n - i :])
        if suffix in {r for rs in _EXCEPTION.values() for r in rs}:
            ps = i - 1
    return ".".join(labels[n - ps - 1 :]) if n > ps else None


LABELS = ["www", "a", "bbc", "co", "uk", "com", "github", "io", "ck", "jp",
          "kobe", "city", "example", "au", "or", "x"]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from(LABELS), min_size=1, max_size=5))
def test_psl_expression_matches_reference(labels):
    # collected per-example into one Spark call would be faster, but
    # hypothesis drives the examples; keep the frame tiny instead
    import pyspark.sql.functions as F

    from polygon_io_data_ingestion_pipeline_spark.functions.psl import (
        registrable_domain,
    )
    from polygon_io_data_ingestion_pipeline_spark.session import get_spark

    host = ".".join(labels)
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    got = (
        spark.createDataFrame([(host,)], "host string")
        .select(registrable_domain(F.col("host")).alias("d"))
        .collect()[0]["d"]
    )
    assert got == _psl_reference(host), host
