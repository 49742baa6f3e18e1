"""Property-based check: chunk_windows invariants on random documents
and window geometry — full coverage, size bounds, overlap structure,
exact reconstruction from stride-aligned chunks."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.text import chunk_windows

docs = st.lists(
    st.integers(min_value=1, max_value=40),  # token counts per doc
    min_size=1,
    max_size=5,
)
geometry = st.tuples(
    st.integers(min_value=1, max_value=12),  # stride
    st.integers(min_value=0, max_value=8),  # extra tokens beyond stride
)


@given(docs=docs, geom=geometry)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunk_windows_invariants(spark, docs, geom):
    stride, extra = geom
    max_tokens = stride + extra
    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(n))) for i, n in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_windows(df, max_tokens=max_tokens, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # One chunk per stride start; ids are dense from 0.
        assert [c["chunk_id"] for c in chunks] == list(range(math.ceil(n / stride)))
        toks_seen = set()
        for c in chunks:
            toks = c["chunk_text"].split()
            # Declared count matches text; bounded by the window.
            assert len(toks) == c["n_chunk_tokens"] <= max_tokens
            # Chunk content is the contiguous doc slice at its start.
            start = c["chunk_id"] * stride
            assert toks == [f"d{i}t{j}" for j in range(start, min(start + max_tokens, n))]
            toks_seen.update(toks)
        # Every token of the document appears in at least one chunk.
        assert toks_seen == {f"d{i}t{j}" for j in range(n)}
