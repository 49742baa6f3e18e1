"""Deletion-neighborhood blocking must be LOSSLESS for its distance
bound: every pair within Levenshtein d shares a <=d-deletion variant.
Proven here against brute-force edit distance on adversarial and random
name sets, for d=1 and d=2, plus the best-match linkage contract."""

from __future__ import annotations

import itertools
import random

from polygon_io_data_ingestion_pipeline_spark.operators.linkage import (
    fuzzy_pairs,
    link_best_match,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(names, max_dist):
    out = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(names), 2):
        if _lev(a, b) <= max_dist:
            out.add((i, j, _lev(a, b)))
    return out


NAMES = [
    "widget",      # base
    "widgets",     # insertion
    "widge",       # deletion
    "wadget",      # substitution
    "gadget",      # distance 2 from widget
    "midget",      # substitution
    "totally different",
    "widget",      # exact duplicate of index 0 (dist 0)
]


def _spark_pairs(spark, names, max_dist):
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = fuzzy_pairs(df, "name", "id", max_dist=max_dist).collect()
    return {(r["id1"], r["id2"], r["dist"]) for r in got}


def test_lossless_d1_handcrafted(spark):
    assert _spark_pairs(spark, NAMES, 1) == _brute_pairs(NAMES, 1)


def test_lossless_d2_handcrafted(spark):
    assert _spark_pairs(spark, NAMES, 2) == _brute_pairs(NAMES, 2)


def test_lossless_random_strings(spark):
    rng = random.Random(17)
    alpha = "abcd"
    names = ["".join(rng.choice(alpha) for _ in range(rng.randint(3, 7))) for _ in range(60)]
    names = list(dict.fromkeys(names))  # unique, order-stable
    for d in (1, 2):
        assert _spark_pairs(spark, names, d) == _brute_pairs(names, d)


def test_best_match_links_dirty_to_master(spark):
    master = spark.createDataFrame(
        [(1, "cold widget"), (2, "small widget"), (3, "large bolt")],
        "pid long, pname string",
    )
    dirty = spark.createDataFrame(
        [(10, "cold widgat"),   # 1 sub  -> pid 1
         (11, "large bolts"),   # 1 ins  -> pid 3
         (12, "smal widget"),   # 1 del  -> pid 2
         (13, "nonsense zz")],  # no match within 2
        "did long, dname string",
    )
    got = {
        r["did"]: (r["pid"], r["dist"])
        for r in link_best_match(
            dirty, master, "dname", "pname", "did", "pid", max_dist=2
        ).collect()
    }
    assert got == {10: (1, 1), 11: (3, 1), 12: (2, 1)}


def test_best_match_tie_breaks_to_lowest_id(spark):
    master = spark.createDataFrame(
        [(5, "abcd"), (2, "abce")], "pid long, pname string"
    )
    dirty = spark.createDataFrame([(1, "abcf")], "did long, dname string")
    got = link_best_match(dirty, master, "dname", "pname", "did", "pid", max_dist=1).collect()
    assert len(got) == 1 and got[0]["pid"] == 2 and got[0]["dist"] == 1
