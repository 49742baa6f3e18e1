"""Ranking-grade convergence (tol=) and incremental warm-start for the
graph iterators: hand-computed fixpoints, delta-run == full-recompute
equality on a grown graph, and the webgraph --warm-start journey."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
    connected_components_star,
    pagerank,
    pagerank_directed,
    personalized_pagerank,
)


def _ranks(df, col="rank"):
    return {r["node"]: r[col] for r in df.collect()}


def test_tol_converges_to_hand_computed_fixpoint(spark):
    """Two-node directed cycle: the fixpoint is exactly 0.5/0.5
    (r = 0.15/2 + 0.85*r_other is symmetric); tol mode must reach it
    and report fewer rounds than the cap."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out, rounds = pagerank_directed(e, tol=1e-10, max_iter=40, return_iters=True)
    got = _ranks(out)
    assert got["a"] == pytest.approx(0.5, abs=1e-9)
    assert got["b"] == pytest.approx(0.5, abs=1e-9)
    assert rounds < 40

    # undirected variant: 3-cycle fixpoint is 1/3 each
    e3 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id1 long, id2 long"
    )
    out3, r3 = pagerank(e3, tol=1e-10, max_iter=40, return_iters=True)
    for v in {r["rank"] for r in out3.collect()}:
        assert v == pytest.approx(1 / 3, abs=1e-9)
    assert r3 < 40


def _grown_graphs(spark):
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    delta = [("e", "c"), ("c", "e"), ("f", "e")]
    g1 = spark.createDataFrame(base, "src string, dst string")
    g2 = spark.createDataFrame(base + delta, "src string, dst string")
    return g1, g2


def test_warm_start_equals_full_recompute_on_grown_graph(spark):
    """Ring + chords base, two new leaf referrers as the delta: the
    warm-started fixpoint EQUALS the cold recompute's (the correctness
    contract — the warm vector is renormalized to mass 1, without which
    it converges to a scaled wrong fixpoint), in no more rounds."""
    base = [(f"n{i}", f"n{(i + 1) % 30}") for i in range(30)] + [
        (f"n{i}", f"n{(i * 7) % 30}") for i in range(0, 30, 3)
    ]
    delta = [("x1", "n0"), ("x2", "n5")]
    g1 = spark.createDataFrame(base, "src string, dst string")
    g2 = spark.createDataFrame(base + delta, "src string, dst string")
    tol = 1e-9
    prev = pagerank_directed(g1, damping=0.5, tol=tol, max_iter=80)
    cold, cold_rounds = pagerank_directed(
        g2, damping=0.5, tol=tol, max_iter=80, return_iters=True
    )
    warm, warm_rounds = pagerank_directed(
        g2, damping=0.5, tol=tol, max_iter=80, init_ranks=prev,
        return_iters=True,
    )
    c, w = _ranks(cold), _ranks(warm)
    assert set(c) == set(w)
    for node in c:
        assert w[node] == pytest.approx(c[node], abs=200 * tol), node
    assert warm_rounds <= cold_rounds < 80


def test_trust_warm_start_equals_full_recompute(spark):
    g1, g2 = _grown_graphs(spark)
    seeds = spark.createDataFrame([("a",)], "node string")
    tol = 1e-9
    prev = personalized_pagerank(g1, seeds, damping=0.5, tol=tol, max_iter=60)
    cold = personalized_pagerank(g2, seeds, damping=0.5, tol=tol, max_iter=60)
    warm, warm_rounds = personalized_pagerank(
        g2, seeds, damping=0.5, tol=tol, max_iter=60, init_ranks=prev,
        return_iters=True,
    )
    c = {r["node"]: r["trust"] for r in cold.collect()}
    w = {r["node"]: r["trust"] for r in warm.collect()}
    assert set(c) == set(w)
    for node in c:
        assert w[node] == pytest.approx(c[node], abs=200 * tol), node
    assert warm_rounds < 60


def test_cc_prior_labels_equal_full_recompute(spark):
    """Prior labels enter as pre-contracted edges: labels on the grown
    graph are EXACTLY the full recompute's (min-id canonical ids)."""
    base = [(1, 2), (2, 3), (10, 11)]
    delta = [(3, 4), (11, 12), (20, 21)]
    g1 = spark.createDataFrame(base, "src long, dst long")
    full = spark.createDataFrame(base + delta, "src long, dst long")
    prior = connected_components_star(g1)
    # incremental run: ONLY the delta edges + prior labels
    delta_df = spark.createDataFrame(delta, "src long, dst long")
    inc = connected_components_star(delta_df, prior_labels=prior)
    got_full = {
        r["node"]: r["component_id"]
        for r in connected_components_star(full).collect()
    }
    got_inc = {r["node"]: r["component_id"] for r in inc.collect()}
    assert got_inc == got_full


def test_webgraph_cli_warm_start_journey(spark, tmp_path, capsys):
    """Second webgraph run with --warm-start over a grown edge table
    produces the same tables as a cold run at the same tol."""
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    base = [
        ("http://a.x/1", "http://a.x/2", "x", False),
        ("http://a.x/2", "http://a.x/1", "y", False),
    ]
    grown = base + [
        ("http://a.x/1", "http://b.x/1", "z", False),
        ("http://b.x/1", "http://a.x/1", "w", False),
    ]
    e1, e2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    schema = "src string, dst string, anchor string, nofollow boolean"
    spark.createDataFrame(base, schema).write.parquet(e1)
    spark.createDataFrame(grown, schema).write.parquet(e2)
    out = str(tmp_path / "wg")
    cold_out = str(tmp_path / "wg_cold")
    # damping 0.5 mixes fast (test runtime); semantics identical
    flags = ["--pagerank-tol", "1e-9", "--pagerank-damping", "0.5",
             "--master", "local[4]"]
    assert main(["webgraph", "--edges", e1, "--out", out] + flags) == 0
    assert main([
        "webgraph", "--edges", e2, "--out", out, "--warm-start",
    ] + flags) == 0
    assert main(["webgraph", "--edges", e2, "--out", cold_out] + flags) == 0
    warm = {r["node"]: r["rank"] for r in spark.read.parquet(out + "/pagerank").collect()}
    cold = {r["node"]: r["rank"] for r in spark.read.parquet(cold_out + "/pagerank").collect()}
    assert set(warm) == set(cold)
    for node in cold:
        assert warm[node] == pytest.approx(cold[node], abs=1e-7), node
    wcc = {r["node"]: r["component_id"] for r in spark.read.parquet(out + "/components").collect()}
    ccc = {r["node"]: r["component_id"] for r in spark.read.parquet(cold_out + "/components").collect()}
    assert wcc == ccc


def test_fixed_unroll_unchanged_by_new_params(spark):
    """The default path (tol=None) must stay the exact 2-iteration
    unroll the docs_web_pagerank oracle replays."""
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    legacy = _ranks(pagerank_directed(e, iters=2))
    again = _ranks(pagerank_directed(e, iters=2, tol=None))
    assert legacy == again


def test_no_spurious_warning_when_converged_on_last_round(spark):
    """Review regression: convergence ON round max_iter must not warn
    'tol not reached' — the 2-node cycle converges in round 1, so
    max_iter=1 converges exactly at the cap."""
    import warnings as _w

    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    with _w.catch_warnings():
        _w.simplefilter("error")  # any warning fails the test
        out, rounds = pagerank_directed(
            e, tol=1e-9, max_iter=1, return_iters=True
        )
        assert rounds == 1
        assert _ranks(out)["a"] == pytest.approx(0.5, abs=1e-9)


def test_webgraph_warm_start_requires_tol(spark, tmp_path, capsys):
    """Review regression: --warm-start without --pagerank-tol would make
    ranks path-dependent (2 rounds applied to the previous output) —
    the CLI exits 2 before any Spark work."""
    from polygon_io_data_ingestion_pipeline_spark.cli import main

    assert main([
        "webgraph", "--edges", str(tmp_path / "nope"), "--out",
        str(tmp_path / "wg"), "--warm-start", "--master", "local[4]",
    ]) == 2
