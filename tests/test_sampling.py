"""Deterministic sampling/split operators: reproducibility under
repartitioning, leak-proof split stability, and stratum rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def test_split_deterministic_and_stable_under_growth(spark):
    small = hash_split(_docs(spark, 200)).collect()
    big = hash_split(_docs(spark, 400).repartition(7)).collect()
    small_map = {r["doc_id"]: r["split"] for r in small}
    big_map = {r["doc_id"]: r["split"] for r in big}
    # A document's split never changes when the corpus grows or the
    # partitioning differs — the leak-proof property.
    for doc_id, split in small_map.items():
        assert big_map[doc_id] == split
    # All three splits materialize with roughly the configured mass.
    from collections import Counter

    c = Counter(big_map.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark, 400)  # 100 docs per source
    out1 = stratified_sample(docs, {"src0": 0.2, "src1": 0.6}).collect()
    out2 = stratified_sample(docs.repartition(13), {"src0": 0.2, "src1": 0.6}).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)
    from collections import Counter

    kept = Counter(r["source"] for r in out1)
    assert kept["src2"] == 100 and kept["src3"] == 100  # default rate 1.0
    assert 5 <= kept["src0"] <= 40  # ~20 of 100, hash-bucket tolerance
    assert 40 <= kept["src1"] <= 80  # ~60 of 100


def test_stratified_sample_inexact_rate_matches_duckdb(spark):
    """Rates whose scaled value is inexact in binary floating point
    (0.07 * 10000 = 699.999...) must produce the same keep set as a
    DuckDB audit of the same parquet: the threshold is computed once in
    Python as int(round(...)), so neither engine's float cast semantics
    (Spark truncates, DuckDB rounds) can enter the comparison."""
    import duckdb

    docs = _docs(spark, 400)
    kept_spark = sorted(
        r["doc_id"] for r in stratified_sample(docs, {"src0": 0.07, "src1": 0.123}).collect()
    )
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    kept_duck = [
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM documents
            WHERE CAST(('0x' || substr(md5('sample' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 10000
                  < (CASE WHEN source = 'src0' THEN 700
                          WHEN source = 'src1' THEN 1230 ELSE 10000 END)
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert kept_spark == kept_duck


def test_mixture_weights_hand_case(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.sampling import mixture_weights
    import pyspark.sql.functions as F2

    # Two strata with a 9:1 token split. alpha=0.5 pulls 0.9/0.1 toward
    # sqrt(0.9)/sqrt(0.1) normalized = 0.75/0.25.
    rows = [("a", 90), ("b", 10)]
    df = spark.createDataFrame(rows, "source string, n_tok int")
    out = {
        r["source"]: r
        for r in mixture_weights(df, F2.col("n_tok"), "source", alpha=0.5).collect()
    }
    assert out["a"]["n_tokens"] == 90 and out["b"]["n_tokens"] == 10
    assert out["a"]["p_raw"] == 0.9 and out["b"]["p_raw"] == 0.1
    assert abs(out["a"]["weight"] - 0.75) < 1e-6
    assert abs(out["b"]["weight"] - 0.25) < 1e-6
    # Weights always renormalize to 1 and compress the raw skew.
    assert abs(out["a"]["weight"] + out["b"]["weight"] - 1.0) < 1e-9
    assert out["a"]["weight"] < out["a"]["p_raw"]
    assert out["b"]["weight"] > out["b"]["p_raw"]


def test_weighted_sample_aes_properties(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.sampling import weighted_sample

    # Heavy-weight rows dominate the draw; zero/negative weights are out.
    rows = [(i, 1000.0 if i < 10 else 0.1) for i in range(200)] + [(900, 0.0), (901, -1.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, F.col("w"), k=10, key_col="doc_id").collect()
    assert len(out) == 10
    got = [r["doc_id"] for r in out]
    assert 900 not in got and 901 not in got
    # With a 10000:1 weight ratio the ten heavy rows win essentially
    # always (P[light key > heavy key] ~ w_l/w_h per pair).
    assert sum(1 for i in got if i < 10) >= 9
    # Deterministic: same draw on a different partitioning.
    again = [r["doc_id"] for r in weighted_sample(df.repartition(7), F.col("w"), k=10).collect()]
    assert got == again
    # Keys are valid A-ES keys (u^(1/w) in (0, 1]) and sorted desc.
    keys = [r["sample_key"] for r in out]
    assert all(0 < s <= 1 for s in keys)
    assert keys == sorted(keys, reverse=True)


def test_cluster_safe_split_never_straddles(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    # 60 docs; ids 3k, 3k+1, 3k+2 are a near-dup chain (transitive:
    # (a,b),(b,c) pairs only — closure must pull c into a's cluster).
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(60)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(k, k + 1) for k in range(0, 60, 3)]
        + [(k + 1, k + 2) for k in range(0, 60, 3)],
        "id1 long, id2 long",
    )
    out = cluster_safe_split(docs, pairs).collect()
    assert len(out) == 60
    by_cluster: dict[int, set] = {}
    for r in out:
        assert r["cluster_id"] == (r["doc_id"] // 3) * 3  # min member
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # the invariant hash_split cannot give: one split per dup class
    assert all(len(s) == 1 for s in by_cluster.values())

    # independence baseline: doc-keyed hashing DOES straddle here
    naive = hash_split(docs).collect()
    naive_by_cluster: dict[int, set] = {}
    for r in naive:
        naive_by_cluster.setdefault(r["doc_id"] // 3, set()).add(r["split"])
    assert any(len(s) > 1 for s in naive_by_cluster.values())


def test_cluster_safe_split_singletons_match_plain_split(spark):
    from polygon_io_data_ingestion_pipeline_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i, f"unique {i}") for i in range(30)], "doc_id long, text string"
    )
    no_pairs = spark.createDataFrame([], "id1 long, id2 long")
    safe = {r["doc_id"]: r["split"] for r in cluster_safe_split(docs, no_pairs).collect()}
    plain = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert safe == plain  # singleton cluster_id == doc_id -> same hash
