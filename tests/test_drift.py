"""PSI drift semantics: identical distributions score ~0, a real shift
scores past the 0.25 alarm, nulls are tracked as their own bucket, and
categories missing on one side stay finite via Laplace smoothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.drift import (
    drift_report,
    psi_categorical,
    psi_numeric,
)

EDGES = [10.0, 20.0, 30.0]


def _vals(spark, vals, col="x"):
    return spark.createDataFrame([(float(v),) for v in vals], f"{col} double")


def test_identical_distributions_score_zero(spark):
    vals = [5, 12, 15, 22, 25, 28, 35, 40] * 20
    row = psi_numeric(_vals(spark, vals), _vals(spark, vals), "x", EDGES).first()
    assert row["psi"] == 0.0 and row["drifted"] == 0
    assert row["n_ref"] == row["n_cur"] == 160


def test_shifted_distribution_alarms(spark):
    ref = [5, 8, 12, 15] * 50          # mass in low buckets
    cur = [32, 35, 38, 41] * 50        # mass entirely past the top edge
    row = psi_numeric(_vals(spark, ref), _vals(spark, cur), "x", EDGES).first()
    assert row["psi"] > 0.25 and row["drifted"] == 1


def test_nulls_tracked_as_own_bucket(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    cur = spark.createDataFrame([(1.0,), (2.0,), (2.5,)], "x double")
    row = psi_numeric(ref, cur, "x", EDGES).first()
    # A null-share change contributes: psi must be nonzero.
    assert row["psi"] > 0.0


def test_categorical_missing_category_is_finite(spark):
    ref = spark.createDataFrame([("a",)] * 9 + [("b",)], "c string")
    cur = spark.createDataFrame([("a",)] * 10, "c string")
    row = psi_categorical(ref, cur, "c").first()
    assert row["n_buckets"] == 2
    assert row["psi"] is not None and row["psi"] > 0.0


def test_report_one_row_per_feature(spark):
    ref = spark.createDataFrame([(1.0, "a"), (25.0, "b")], "x double, c string")
    cur = spark.createDataFrame([(2.0, "a"), (26.0, "b")], "x double, c string")
    rep = drift_report(ref, cur, numeric={"x": EDGES}, categorical=["c"])
    got = {r["feature"]: r for r in rep.collect()}
    assert set(got) == {"x", "c"}
    assert all(r["n_ref"] == 2 and r["n_cur"] == 2 for r in got.values())


def test_null_category_on_both_sides_is_one_bucket(spark):
    """NULL==NULL never matches in a plain join; the PSI bucket join
    must be null-safe or a NULL category present on both sides splits
    into two phantom single-sided buckets and reports spurious drift."""
    ref = spark.createDataFrame([("a",)] * 5 + [(None,)] * 5, "c string")
    cur = spark.createDataFrame([("a",)] * 5 + [(None,)] * 5, "c string")
    row = psi_categorical(ref, cur, "c").first()
    assert row["n_buckets"] == 2
    assert row["psi"] == 0.0 and row["drifted"] == 0
