"""duplicate_clusters: transitive closure of near-dup pairs into
components with min-member canonical labels."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.dedup import duplicate_clusters


def _clusters(spark, pairs, ids=None):
    pdf = spark.createDataFrame(pairs, "id1 bigint, id2 bigint")
    all_ids = (
        spark.createDataFrame([(i,) for i in ids], "doc_id bigint") if ids is not None else None
    )
    out = duplicate_clusters(pdf, all_ids=all_ids)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}

def test_chain_is_one_component(spark):
    # A~B, B~C, C~D: a 4-chain must collapse to one cluster even though
    # A~D was never emitted as a pair
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_and_singletons(spark):
    got = _clusters(spark, [(10, 11), (20, 21), (21, 22)], ids=[10, 11, 20, 21, 22, 30])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30}


def test_long_chain_converges(spark):
    # a 12-node path needs ~log-diameter+ rounds of propagation; pins
    # that the fixpoint loop actually iterates to convergence
    pairs = [(i, i + 1) for i in range(12)]
    got = _clusters(spark, pairs)
    assert set(got.values()) == {0} and len(got) == 13


def test_star_graph(spark):
    got = _clusters(spark, [(5, 9), (5, 7), (5, 6), (5, 8)])
    assert got == {5: 5, 6: 5, 7: 5, 8: 5, 9: 5}
