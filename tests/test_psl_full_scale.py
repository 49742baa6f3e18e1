"""Full-PSL scalability proof: the statically-unrolled expression
strategy compiles and answers correctly from a FULL-SIZE rule set
(~9,500 rules, the upstream list's label-depth distribution), and the
broadcast-join fallback (constant plan size) agrees with it exactly —
on the synthetic full list AND on the committed snapshot."""

from __future__ import annotations

import time

import pytest

from polygon_io_data_ingestion_pipeline_spark.functions.psl import (
    PSL_SNAPSHOT,
    parse_psl,
    public_suffix_labels,
    registrable_domain,
    registrable_domain_join,
)


def _full_size_rules():
    """~9,500 deterministic synthetic rules with the upstream list's
    shape: mostly 2-label exact registries, a 3-label tier, wildcards,
    and exceptions under some wildcards (an exception's tail is always
    a wildcard base, as in the real list)."""
    lines = []
    for i in range(7000):
        lines.append(f"l{i % 900}.t{i % 97}")          # 2-label exact
    for i in range(2000):
        lines.append(f"m{i}.l{i % 900}.t{i % 97}")     # 3-label exact
    for i in range(400):
        lines.append(f"*.w{i}.t{i % 97}")              # wildcard, base 2
    for i in range(100):
        lines.append(f"!free.w{i}.t{i % 97}")          # exception, 3 labels
    return parse_psl("\n".join(lines)), lines


HOSTS = [
    "site.l5.t5",            # 2-label exact -> site.l5.t5
    "deep.sub.site.l5.t5",   # same suffix, deeper host
    "l5.t5",                 # IS a public suffix -> NULL
    "a.m7.l7.t7",            # 3-label exact
    "x.anything.w3.t3",      # wildcard: ps = anything.w3.t3 (3 labels)
    "anything.w3.t3",        # host IS the wildcard suffix -> NULL
    "free.w9.t9",            # exception: ps = w9.t9 -> free.w9.t9
    "sub.free.w9.t9",        # exception, deeper
    "plain.example",         # no rule -> default TLD
    "localhost",             # single label -> NULL
    "10.0.0.1",              # IPv4 -> NULL
    None,
]

EXPECTED = {
    "site.l5.t5": "site.l5.t5",
    "deep.sub.site.l5.t5": "site.l5.t5",
    "l5.t5": None,
    "a.m7.l7.t7": "a.m7.l7.t7",
    "x.anything.w3.t3": "x.anything.w3.t3",
    "anything.w3.t3": None,
    "free.w9.t9": "free.w9.t9",
    "sub.free.w9.t9": "free.w9.t9",
    "plain.example": "plain.example",
    "localhost": None,
    "10.0.0.1": None,
    None: None,
}


def test_expression_strategy_holds_at_full_psl_scale(spark):
    """The unrolled expression compiles from ~9,500 rules and answers
    the hand-checked matrix — and analysis+execution stays in sane
    time (codegen limits would show up here as minutes or a crash)."""
    rules, lines = _full_size_rules()
    assert sum(len(v) for b in rules for v in b.values()) >= 9000, len(lines)
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    t0 = time.monotonic()
    got = {
        r["host"]: r["dom"]
        for r in df.select(
            "host", registrable_domain("host", rules=rules).alias("dom")
        ).collect()
    }
    elapsed = time.monotonic() - t0
    assert got == EXPECTED
    # generous bound: the probe chain is ~40 array literals; a codegen
    # or analysis blow-up would be orders of magnitude past this
    assert elapsed < 120, f"full-PSL expression took {elapsed:.1f}s"


def test_join_strategy_matches_expression_at_full_scale(spark):
    rules, _ = _full_size_rules()
    # the hand-checked matrix plus a spread of generated hosts hitting
    # every rule family and miss shapes
    hosts = [h for h in HOSTS if h is not None] + [
        f"host{i}.l{i % 900}.t{i % 97}" for i in range(0, 900, 37)
    ] + [
        f"a.b.m{i}.l{i % 900}.t{i % 97}" for i in range(0, 2000, 113)
    ] + [
        f"x{i}.w{i % 400}.t{i % 97}" for i in range(0, 400, 29)
    ] + [f"nohit{i}.zone" for i in range(10)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    expr = {
        r["host"]: r["dom"]
        for r in df.select(
            "host", registrable_domain("host", rules=rules).alias("dom")
        ).collect()
    }
    joined = {
        r["host"]: r["url_domain"]
        for r in registrable_domain_join(df, rules=rules).collect()
    }
    assert expr == joined


def test_join_strategy_matches_expression_on_snapshot(spark):
    """Committed-snapshot parity on the classic cases (co.uk, wildcard
    ck, kobe.jp exception, private platforms, misses, IPs)."""
    hosts = [
        "www.bbc.co.uk", "bbc.co.uk", "co.uk", "example.com",
        "a.b.github.io", "www.city.kobe.jp", "other.kobe.jp",
        "x.anything.ck", "s3.amazonaws.com", "bucket.s3.amazonaws.com",
        "plain.example", "localhost", "192.168.0.1", None,
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    expr = {
        r["host"]: r["dom"]
        for r in df.select(
            "host", registrable_domain("host").alias("dom")
        ).collect()
    }
    joined = {
        r["host"]: r["url_domain"]
        for r in registrable_domain_join(df).collect()
    }
    assert expr == joined
    assert expr["www.bbc.co.uk"] == "bbc.co.uk"
    assert expr["www.city.kobe.jp"] == "city.kobe.jp"


def test_join_strategy_preserves_row_multiplicity(spark):
    df = spark.createDataFrame(
        [("www.bbc.co.uk", 1), ("www.bbc.co.uk", 2), ("example.com", 3)],
        "host string, k int",
    )
    out = registrable_domain_join(df).collect()
    assert len(out) == 3
    assert {r["k"] for r in out} == {1, 2, 3}


def test_full_scale_public_suffix_labels_consistency(spark):
    """ps labels from the expression path agree with what the domain
    implies (domain label count = ps + 1) on generated full-scale hits."""
    rules, _ = _full_size_rules()
    hosts = [f"h.x{i}.w{i % 400}.t{i % 97}" for i in range(0, 400, 53)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select(
        "host",
        public_suffix_labels("host", rules=rules).alias("ps"),
        registrable_domain("host", rules=rules).alias("dom"),
    ).collect()
    for r in rows:
        assert r["ps"] == 3  # wildcard base 2 -> suffix 3 labels
        assert r["dom"].count(".") == r["ps"]
