"""Directed PageRank with dangling-node mass: hand-computed fixpoint
checks, mass conservation, dangling redistribution, and the web-graph
journey (pages -> extracted outlinks -> directed ranks)."""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
    pagerank_directed,
)


def _ranks(spark, edges, iters=2):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["out_degree"], r["rank"])
        for r in pagerank_directed(df, iters=iters).collect()
    }


def test_hand_computed_two_node_cycle(spark):
    # a <-> b: symmetric, every iteration keeps r = 1/2 exactly
    got = _ranks(spark, [("a", "b"), ("b", "a")], iters=3)
    assert got == {"a": (1, 0.5), "b": (1, 0.5)}


def test_hand_computed_dangling_sink(spark):
    """a->b, b dangles.  Iter 1: r(a) = 0.15/2 + 0.85*(0.5/2) = 0.2875
    (only the dangling half redistributes to a); r(b) = 0.15/2 +
    0.85*(0.5 + 0.5/2) = 0.7125.  Mass stays 1."""
    got = _ranks(spark, [("a", "b")], iters=1)
    assert got["a"] == (1, 0.2875)
    assert got["b"] == (0, 0.7125)
    assert abs(sum(r for _, r in got.values()) - 1.0) < 1e-9


def test_mass_conserved_with_dangling_nodes(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]  # c dangles
    got = _ranks(spark, edges, iters=4)
    total = sum(r for _, r in got.values())
    assert abs(total - 1.0) < 1e-8
    # the sink accumulates the most rank; the unreferenced source the least
    assert got["c"][1] == max(r for _, r in got.values())
    assert got["d"][1] == min(r for _, r in got.values())


def test_direction_matters_vs_undirected(spark):
    """Endorsement asymmetry: every page links to hub, hub links
    nowhere -> hub's rank dwarfs the others; the undirected variant
    would give the leaves equal benefit back."""
    edges = [("p1", "hub"), ("p2", "hub"), ("p3", "hub")]
    got = _ranks(spark, edges, iters=3)
    assert got["hub"][1] > 3 * got["p1"][1]
    assert got["p1"] == got["p2"] == got["p3"]


def test_web_graph_journey_from_outlinks(spark):
    from polygon_io_data_ingestion_pipeline_spark.sources.archive import (
        extract_outlinks,
    )

    def page(links):
        return (
            "<html><body>"
            + "".join(f'<a href="{h}">x</a>' for h in links)
            + "</body></html>"
        ).encode()

    pages = spark.createDataFrame(
        [
            ("http://h.example/a", page(["/popular", "/b"])),
            ("http://h.example/b", page(["/popular"])),
            ("http://h.example/c", page(["/popular"])),
        ],
        "url string, payload binary",
    )
    edges = extract_outlinks(pages).select("src", "dst").distinct()
    got = {
        r["node"]: r["rank"]
        for r in pagerank_directed(edges, iters=2, src="src", dst="dst").collect()
    }
    assert got["http://h.example/popular"] == max(got.values())


def test_plan_has_no_python(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    plan = (
        pagerank_directed(df, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


# --- round 9 (second session): TrustRank / personalized PageRank -------------


def test_trustrank_hand_computed_two_nodes(spark):
    """Seeds {A}, edge A->B, two iterations — every value from the
    TrustRank recursion by hand (dangling mass returns to the seed)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    e = spark.createDataFrame([("A", "B")], "src string, dst string")
    seeds = spark.createDataFrame([("A",)], "node string")
    got = {
        r["node"]: r["trust"]
        for r in personalized_pagerank(e, seeds, iters=2).collect()
    }
    # r0 = (A:1, B:0)
    # it1: A = 0.15*1 + 0.85*(0 + 0*1)      = 0.15
    #      B = 0.15*0 + 0.85*(1 + 0)        = 0.85
    # it2: dangling = r(B) = 0.85 -> back to the seed
    #      A = 0.15 + 0.85*(0 + 0.85*1)     = 0.8725
    #      B = 0      + 0.85*(0.15 + 0)     = 0.1275
    assert got == {"A": 0.8725, "B": 0.1275}


def test_trustrank_spam_cluster_scores_zero(spark):
    """A cluster unreachable from any seed gets exactly zero trust no
    matter how densely it interlinks (the point of the construction —
    plain pagerank ranks it)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
        pagerank_directed,
        personalized_pagerank,
    )

    rows = [
        ("good1", "good2"), ("good2", "good1"), ("good1", "page"),
        # spam farm: dense, high pagerank, no inlink from the good side
        ("spam1", "spam2"), ("spam2", "spam3"), ("spam3", "spam1"),
        ("spam1", "spam3"), ("spam2", "spam1"), ("spam3", "spam2"),
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("good1",)], "node string")
    trust = {
        r["node"]: r["trust"]
        for r in personalized_pagerank(e, seeds, iters=3).collect()
    }
    rank = {
        r["node"]: r["rank"] for r in pagerank_directed(e, iters=3).collect()
    }
    assert all(trust[n] == 0.0 for n in ("spam1", "spam2", "spam3"))
    assert trust["page"] > 0 and trust["good2"] > 0
    assert rank["spam1"] > rank["page"]  # pagerank falls for the farm


def test_trustrank_absent_seeds_ignored_and_empty_seed_set(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    e = spark.createDataFrame([("A", "B")], "src string, dst string")
    # a seed not in the graph is ignored: mass still sums over {A}
    seeds = spark.createDataFrame([("A",), ("ghost",)], "node string")
    got = {
        r["node"]: r["trust"]
        for r in personalized_pagerank(e, seeds, iters=2).collect()
    }
    assert got == {"A": 0.8725, "B": 0.1275}
    # empty effective seed set -> all zero, no error
    none = spark.createDataFrame([("ghost",)], "node string")
    got0 = {
        r["node"]: r["trust"]
        for r in personalized_pagerank(e, none, iters=1).collect()
    }
    assert got0 == {"A": 0.0, "B": 0.0}
