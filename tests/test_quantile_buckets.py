"""Per-group score quantile bucketing (operators/sampling.py
score_quantile_buckets — the CCNet head/middle/tail gate): hand-computed
buckets with ties, per-group independence, NULL/quantize/k contracts,
and the distinct-score-histogram plan shape."""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.sampling import (
    score_quantile_buckets,
)


def _df(spark, rows, schema="doc_id long, lang string, score double"):
    return spark.createDataFrame(rows, schema)


def _buckets(df, **kw):
    return {
        r["doc_id"]: r["bucket"]
        for r in score_quantile_buckets(df, "score", **kw).collect()
    }


def test_balanced_terciles_on_distinct_scores(spark):
    rows = [(i, "en", float(i)) for i in range(1, 13)]  # 12 distinct
    got = _buckets(_df(spark, rows), by_col="lang", k=3)
    assert [got[i] for i in range(1, 13)] == [1] * 4 + [2] * 4 + [3] * 4


def test_ties_share_their_first_position_bucket(spark):
    # en: scores 1,2,2,3,4,5 — the tie at 2 occupies positions 2-3;
    # its FIRST position (2) is in bucket 1, so both rows land there
    # (percentile_disc semantics: a boundary never splits a tie group)
    rows = [
        (1, "en", 1.0), (2, "en", 2.0), (3, "en", 2.0),
        (4, "en", 3.0), (5, "en", 4.0), (6, "en", 5.0),
    ]
    got = _buckets(_df(spark, rows), by_col="lang", k=3)
    assert [got[i] for i in range(1, 7)] == [1, 1, 1, 2, 3, 3]


def test_groups_bucket_independently(spark):
    rows = [
        (1, "en", 10.0), (2, "en", 20.0), (3, "en", 30.0),
        (4, "de", 1.0), (5, "de", 2.0),
    ]
    got = _buckets(_df(spark, rows), by_col="lang", k=3)
    assert (got[1], got[2], got[3]) == (1, 2, 3)
    # de has n=2 < k: positions 1, 2 -> buckets 1, 2 (never k+1, never 0)
    assert (got[4], got[5]) == (1, 2)


def test_null_scores_get_null_bucket(spark):
    rows = [(1, "en", 1.0), (2, "en", None), (3, "en", 2.0)]
    got = _buckets(_df(spark, rows), by_col="lang", k=2)
    assert got[2] is None
    assert (got[1], got[3]) == (1, 2)


def test_global_bucketing_without_group(spark):
    rows = [(i, "x", float(i)) for i in range(1, 5)]
    got = _buckets(_df(spark, rows), k=2)
    assert [got[i] for i in range(1, 5)] == [1, 1, 2, 2]


def test_quantize_coarsens_the_histogram_key(spark):
    # 1.0001 vs 1.0002 collapse under quantize=0.01 -> same bucket;
    # exact mode separates them
    rows = [(1, "en", 1.0001), (2, "en", 1.0002), (3, "en", 9.0)]
    exact = _buckets(_df(spark, rows), by_col="lang", k=3)
    assert (exact[1], exact[2], exact[3]) == (1, 2, 3)
    coarse = _buckets(_df(spark, rows), by_col="lang", k=3, quantize=0.01)
    assert coarse[1] == coarse[2] == 1  # tied at the quantized key
    assert coarse[3] == 3


def test_k_must_be_at_least_two(spark):
    with pytest.raises(ValueError, match="k must be >= 2"):
        score_quantile_buckets(
            _df(spark, [(1, "en", 1.0)]), "score", by_col="lang", k=1
        )


def test_input_columns_survive(spark):
    out = score_quantile_buckets(
        _df(spark, [(1, "en", 1.0)]), "score", by_col="lang"
    )
    assert set(out.columns) == {"doc_id", "lang", "score", "bucket"}


def test_plan_windows_over_histogram_not_documents(spark):
    """The scale contract: the cumulative window must partition by the
    group key (hash exchange, never SinglePartition when grouped), and
    the bucket map joins back as an equi-join."""
    from polygon_io_data_ingestion_pipeline_spark.plans.lint import (
        assert_scalable,
        plan_text,
    )

    df = score_quantile_buckets(
        _df(spark, [(i, "l%d" % (i % 3), float(i)) for i in range(30)]),
        "score",
        by_col="lang",
        k=3,
    )
    assert_scalable(df)
    assert "SinglePartition" not in plan_text(df)


def test_null_group_key_is_a_real_group(spark):
    """A NULL group value (unknown language) must bucket within its own
    group, not receive a NULL bucket — the join back from the histogram
    is null-safe on the group key (regression: plain equality handed
    every NULL-lang row a NULL bucket, silently disabling the gate on
    unlabeled corpora)."""
    rows = [(1, None, 1.0), (2, None, 2.0), (3, None, 3.0), (4, "en", 5.0)]
    got = _buckets(_df(spark, rows), by_col="lang", k=3)
    assert (got[1], got[2], got[3]) == (1, 2, 3)
    assert got[4] == 1


# ---------------------------------------------------------------------------
# Hypothesis: the engine vs a pure-Python percentile-disc restatement
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# small score domain so tie groups actually form
_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", None]),
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
    ),
    min_size=1,
    max_size=24,
)


def _python_buckets(rows, k):
    """Independent restatement: within each group, a row whose tie
    group FIRST occupies 1-based position p lands in floor((p-1)k/n)+1;
    NULL scores -> NULL."""
    from collections import Counter, defaultdict

    by_group = defaultdict(list)
    for i, (g, s) in enumerate(rows):
        if s is not None:
            by_group[g].append(float(s))
    out = {}
    for i, (g, s) in enumerate(rows):
        if s is None:
            out[i] = None
            continue
        scores = sorted(by_group[g])
        n = len(scores)
        counts = Counter(scores)
        pos_first = 1 + sum(
            c for v, c in counts.items() if v < float(s)
        )
        out[i] = int((pos_first - 1) * k // n) + 1
    return out


@given(rows=_ROWS, k=st.integers(min_value=2, max_value=5))
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_property_engine_matches_python_restatement(spark, rows, k):
    df = spark.createDataFrame(
        [(i, g, float(s) if s is not None else None)
         for i, (g, s) in enumerate(rows)],
        "doc_id long, lang string, score double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_quantile_buckets(
            df, "score", by_col="lang", k=k
        ).collect()
    }
    assert got == _python_buckets(rows, k)
