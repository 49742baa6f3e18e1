"""Large-star/small-star connected components: agreement with the
min-label-propagation labeller on random graphs, logarithmic-round
convergence on the chain graphs propagation is worst at, string (URL)
node ids, and the singleton convention."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
    connected_components_star,
)


def _cc_reference(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    """Union-find ground truth."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-member labels
    comp: dict[int, set[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), set()).add(n)
    return {n: min(m) for _, m in comp.items() for n in m}


edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0,
    max_size=25,
)


@given(raw=edge_lists)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_star_cc_matches_union_find(spark, raw):
    nodes = {n for e in raw for n in e} | set(range(16))
    df = spark.createDataFrame(raw or [(0, 0)], "src long, dst long")
    ids = spark.createDataFrame([(n,) for n in sorted(nodes)], "node long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components_star(df, all_ids=ids).collect()
    }
    assert got == _cc_reference(raw, nodes)


def test_chain_converges_in_log_rounds(spark):
    """A 60-node path: diameter 59, so min-label propagation would need
    ~59 rounds — star contraction must finish inside max_iter=10."""
    n = 60
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components_star(df, max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_string_url_nodes_use_lexicographic_min(spark):
    df = spark.createDataFrame(
        [
            ("http://b.example/x", "http://a.example/y"),
            ("http://a.example/y", "http://c.example/z"),
            ("http://q.example/1", "http://r.example/2"),
        ],
        "src string, dst string",
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components_star(df).collect()
    }
    assert got["http://c.example/z"] == "http://a.example/y"
    assert got["http://r.example/2"] == "http://q.example/1"


def test_self_loops_nulls_and_singletons(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, None), (None, 3), (4, 5)], "src long, dst long"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components_star(df, all_ids=ids).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 4, 6: 6}

def test_max_iter_exhaustion_raises_not_silent(spark):
    """max_iter exhausted with the edge set still contracting must RAISE:
    returning the labels at that point would be partially-contracted
    (silently wrong) components."""
    import pytest

    n = 40  # long chain: one round cannot finish contracting it
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(df, max_iter=1)
    # an empty edge list is trivially converged, never an error
    empty = spark.createDataFrame([], "src long, dst long")
    ids = spark.createDataFrame([(1,), (2,)], "node long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components_star(empty, all_ids=ids, max_iter=0).collect()
    }
    assert got == {1: 1, 2: 2}
