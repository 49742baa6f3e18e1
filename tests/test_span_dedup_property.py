"""Property-based check: duplicated_span_removal against a pure-Python
reference implementation on random small corpora over a tiny vocabulary
(tiny so cross-document K-gram collisions actually happen), plus the
structural invariants every output must satisfy."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
    duplicated_span_removal,
)

VOCAB = ["a", "b", "c"]

corpus = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=5,
)
span_k = st.integers(min_value=2, max_value=4)


def _reference(docs: list[list[str]], k: int, min_docs: int) -> list[list[str]]:
    """Direct restatement of the contract: flag every position covered
    by a K-gram occurring in >= min_docs distinct docs; keep the rest."""
    owners: dict[tuple, set[int]] = {}
    for d, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            owners.setdefault(tuple(toks[i : i + k]), set()).add(d)
    dup = {g for g, who in owners.items() if len(who) >= min_docs}
    out = []
    for toks in docs:
        covered = set()
        for i in range(len(toks) - k + 1):
            if tuple(toks[i : i + k]) in dup:
                covered.update(range(i, i + k))
        out.append([t for j, t in enumerate(toks) if j not in covered])
    return out


@given(docs=corpus, k=span_k)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_span_removal_matches_reference(spark, docs, k):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in duplicated_span_removal(df, span_tokens=k, min_docs=2).collect()
    }
    want = _reference(docs, k, 2)
    for i, toks in enumerate(docs):
        assert got[i] == " ".join(want[i]), (i, docs, k)
        # structural invariants: output tokens are a subsequence of the
        # input's, and no flagged K-gram survives verbatim
        out_toks = got[i].split() if got[i] else []
        it = iter(toks)
        assert all(any(t == u for u in it) for t in out_toks)
