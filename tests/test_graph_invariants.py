"""Cross-cutting invariants of the web-graph operators: rank/trust
mass conservation under the quantization discipline, and star-CC vs
label-propagation agreement on a directed web-shaped fixture."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.graph import (
    connected_components_star,
    pagerank_directed,
    personalized_pagerank,
)


def _edges(spark):
    # two hosts of chained pages + a cross link + a dangling leaf
    rows = (
        [(f"h0/p{i}", f"h0/p{i + 1}") for i in range(5)]
        + [(f"h1/p{i}", f"h1/p{i + 1}") for i in range(4)]
        + [("h0/p2", "h1/p0"), ("h1/p4", "leaf")]
    )
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_mass_is_conserved(spark):
    """Dangling-node redistribution means total rank stays 1.0 every
    iteration — within the 12-decimal quantization budget (N nodes x
    0.5e-12 per round)."""
    for iters in (1, 2, 4):
        ranks = pagerank_directed(_edges(spark), iters=iters).collect()
        total = sum(r["rank"] for r in ranks)
        assert abs(total - 1.0) < 1e-9, (iters, total)


def test_trustrank_mass_bounded_by_one_and_seed_monotone(spark):
    """Trust mass is conserved (dangling returns to seeds) and adding a
    seed never reduces the set of trusted nodes."""
    e = _edges(spark)
    s1 = spark.createDataFrame([("h0/p0",)], "node string")
    s2 = spark.createDataFrame([("h0/p0",), ("h1/p0",)], "node string")
    t1 = {r["node"]: r["trust"] for r in personalized_pagerank(e, s1, iters=3).collect()}
    t2 = {r["node"]: r["trust"] for r in personalized_pagerank(e, s2, iters=3).collect()}
    assert abs(sum(t1.values()) - 1.0) < 1e-9
    assert abs(sum(t2.values()) - 1.0) < 1e-9
    reached1 = {n for n, t in t1.items() if t > 0}
    reached2 = {n for n, t in t2.items() if t > 0}
    assert reached1 <= reached2


def test_star_cc_agrees_with_label_propagation_on_web_fixture(spark):
    """Both CC algorithms must label the directed web fixture
    identically (undirected connectivity; min-member canonical id)."""
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.dedup import (
        duplicate_clusters,
    )

    e = _edges(spark)
    star = {
        r["node"]: r["component_id"]
        for r in connected_components_star(e, id_col="node").collect()
    }
    pairs = e.select(F.col("src").alias("id1"), F.col("dst").alias("id2"))
    prop = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, id_col="doc_id").collect()
    }
    assert star == prop
