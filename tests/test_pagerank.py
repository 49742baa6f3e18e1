"""PageRank on hand-checkable graphs: exact one-step values on a path,
conservation and symmetry properties, and the hub-detection behavior
the near-dup use case relies on."""

from __future__ import annotations

import pytest

from polygon_io_data_ingestion_pipeline_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    return {r["node"]: r for r in pagerank(df, **kw).collect()}


def test_one_iteration_path_graph_exact(spark):
    # Path 1-2-3: deg = (1, 2, 1), N = 3, r0 = 1/3.
    out = _ranks(spark, [(1, 2), (2, 3)], iters=1)
    assert out[1]["rank"] == pytest.approx(0.05 + 0.85 * (1 / 3) / 2, abs=1e-9)
    assert out[2]["rank"] == pytest.approx(0.05 + 0.85 * (2 / 3), abs=1e-9)
    assert out[3]["rank"] == out[1]["rank"]  # symmetric ends identical
    assert out[2]["degree"] == 2 and out[1]["degree"] == 1


def test_rank_mass_conserved_and_converging(spark):
    # Symmetric graphs have no dangling mass: total rank stays 1.
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    for iters in (1, 3, 6):
        out = _ranks(spark, edges, iters=iters)
        assert sum(r["rank"] for r in out.values()) == pytest.approx(1.0, abs=1e-6)


def test_star_center_is_the_hub(spark):
    # The boilerplate-hub scenario: one doc overlapping many others.
    out = _ranks(spark, [(0, i) for i in range(1, 7)], iters=3)
    center, leaves = out[0]["rank"], [out[i]["rank"] for i in range(1, 7)]
    assert all(center > lr for lr in leaves)
    assert len({round(lr, 12) for lr in leaves}) == 1  # leaves identical
    assert out[0]["degree"] == 6


def test_triangle_stats_hand_graph(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (every node in 3 triangles, clustering 1.0) plus a
    # pendant chain 4-5-6 (no triangles; 5 has degree 2, clustering 0).
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r["node"]: r.asDict() for r in triangle_stats(df).collect()}
    assert got[1]["n_triangles"] == 3 and got[1]["clustering"] == 1.0
    assert got[2]["n_triangles"] == 3 and got[3]["n_triangles"] == 3
    # Node 4 sits in the K4 triangles only; degree 4 (1,2,3,5) ->
    # clustering 3*2/(4*3) = 0.5.
    assert got[4]["degree"] == 4 and got[4]["n_triangles"] == 3
    assert got[4]["clustering"] == 0.5
    assert got[5] == {"node": 5, "degree": 2, "n_triangles": 0, "clustering": 0.0}
    assert got[6]["degree"] == 1 and got[6]["clustering"] == 0.0
