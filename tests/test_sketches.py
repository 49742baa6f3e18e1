"""Sketch aggregates vs exact answers: the error bound IS the
contract, so it is what gets asserted — on the driver testdata
documents/embeddings at sf0.01."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
)
from polygon_io_data_ingestion_pipeline_spark.sources import table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    docs = table(spark, SF, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = toks.select(F.countDistinct("tok").alias("n")).first()["n"]
    approx = approx_distinct(toks, "tok", rsd=0.02).first()["n_distinct_approx"]
    assert abs(approx - exact) <= 5 * 0.02 * exact  # 5 sigma of the rsd

    # grouped form: per-source distinct token counts
    per_src = {
        r["source"]: r["n_distinct_approx"]
        for r in approx_distinct(
            docs.select("source", F.explode(F.split("text", " ")).alias("tok")),
            "tok",
            group_cols=("source",),
        ).collect()
    }
    exact_src = {
        r["source"]: r["n"]
        for r in docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    assert set(per_src) == set(exact_src)
    for src, n in exact_src.items():
        assert abs(per_src[src] - n) <= 5 * 0.02 * n, src


def test_approx_quantiles_within_rank_error(spark):
    docs = table(spark, SF, "documents")
    probs = (0.25, 0.5, 0.9)
    got = approx_quantiles(
        docs, "n_chars", probabilities=probs, relative_error=0.01
    ).first()["quantiles"]
    values = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    n = len(values)
    for p, q in zip(probs, got):
        # rank of the sketch answer must be within relative_error*n of p*n
        import bisect

        lo = bisect.bisect_left(values, q)
        hi = bisect.bisect_right(values, q)
        target = p * n
        assert lo - 0.01 * n - 1 <= target <= hi + 0.01 * n + 1, (p, q)


def test_count_min_never_underestimates_and_is_tight(spark):
    from collections import Counter

    from polygon_io_data_ingestion_pipeline_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    # Zipf-ish key stream: key_k appears (60 - k) times
    vals = [f"key_{k}" for k in range(50) for _ in range(60 - k)]
    exact = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(8)
    sketch = count_min_sketch(df, "v", width=512, depth=4)
    est = cms_estimate(sketch, list(exact) + ["never_seen"], width=512)

    n = len(vals)
    eps_bound = (2.718 / 512) * n  # CMS guarantee at width 512
    for k, c in exact.items():
        assert est[k] >= c  # NEVER underestimates
        assert est[k] <= c + eps_bound
    assert est["never_seen"] <= eps_bound


def test_count_min_sketches_merge_by_cell_sum(spark):
    from pyspark.sql import functions as F

    from polygon_io_data_ingestion_pipeline_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 5, "v string")
    b = spark.createDataFrame([("x",)] * 10 + [("z",)] * 7, "v string")
    merged = (
        count_min_sketch(a, "v", width=256, depth=3)
        .unionByName(count_min_sketch(b, "v", width=256, depth=3))
        .groupBy("row", "bucket", "width")
        .agg(F.sum("c").alias("c"))
    )
    whole = count_min_sketch(a.unionByName(b), "v", width=256, depth=3)
    m = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    w = {(r["row"], r["bucket"]): r["c"] for r in whole.collect()}
    assert m == w  # merging partial sketches == sketching the union
    est = cms_estimate(merged, ["x", "y", "z"])  # width read from the cells
    assert est["x"] >= 40 and est["y"] >= 5 and est["z"] >= 7


def test_cms_width_mismatch_raises(spark):
    import pytest as _pytest

    from polygon_io_data_ingestion_pipeline_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([("x",)] * 5, "v string")
    sketch = count_min_sketch(df, "v", width=128, depth=3)
    with _pytest.raises(ValueError, match="built with width=128"):
        cms_estimate(sketch, ["x"], width=2048)
    # matching explicit width is fine, as is omitting it
    assert cms_estimate(sketch, ["x"], width=128)["x"] >= 5
    assert cms_estimate(sketch, ["x"])["x"] >= 5
