"""Profiling and constraint operators: exact counts on crafted frames,
HLL-mode agreement floor vs exact, injected violations counted
correctly, and the one-pass plan shape for row-level rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.profile import (
    check_constraints,
    check_foreign_key,
    check_unique,
    profile_columns,
    quality_report,
)


def _frame(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),  # violates positive rule
        (2, "b", None),  # dup key; null violates positive rule too
        (4, None, 7.0),  # null category
    ]
    return spark.createDataFrame(rows, "k long, cat string, v double")


def test_profile_exact_counts(spark):
    out = {r["column"]: r for r in profile_columns(_frame(spark), ["k", "cat"], exact=True).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 3
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "4"
    assert out["cat"]["n_nulls"] == 1
    assert out["cat"]["n_distinct"] == 2  # distinct ignores null
    assert out["cat"]["min_value"] == "a" and out["cat"]["max_value"] == "b"


def test_profile_hll_mode_one_pass_and_close(spark, sf_dir):
    from polygon_io_data_ingestion_pipeline_spark.sources import table

    orders = table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    approx = {r["column"]: r for r in profile_columns(orders, cols).collect()}
    exact = {r["column"]: r for r in profile_columns(orders, cols, exact=True).collect()}
    for c in cols:
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_value"] == exact[c]["min_value"]
        # HLL default rsd=5%: allow a generous floor
        assert abs(approx[c]["n_distinct"] - exact[c]["n_distinct"]) <= max(
            2, 0.1 * exact[c]["n_distinct"]
        )
    # ONE aggregation pass: a single scan feeds the sketch aggregation.
    plan = profile_columns(orders, cols)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_constraints_count_injected_violations(spark):
    out = {
        r["check"]: r
        for r in check_constraints(
            _frame(spark), {"v_positive": F.col("v") > 0, "k_not_null": F.col("k").isNotNull()}
        ).collect()
    }
    # -5.0 and NULL both violate (a null never satisfies a rule).
    assert out["v_positive"]["n_violations"] == 2 and out["v_positive"]["passed"] == 0
    assert out["k_not_null"]["n_violations"] == 0 and out["k_not_null"]["passed"] == 1


def test_unique_and_fk_checks(spark):
    df = _frame(spark)
    u = check_unique(df, ["k"]).collect()[0]
    assert u["check"] == "unique_k" and u["n_violations"] == 1 and u["passed"] == 0
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    fk = check_foreign_key(df, parent, "k", "pk").collect()[0]
    assert fk["n_violations"] == 1  # k=4 has no parent
    report = quality_report(
        [check_unique(df, ["k"]), check_foreign_key(df, parent, "k", "pk")]
    ).collect()
    assert {r["check"] for r in report} == {"unique_k", "fk_k"}


def test_free_text_rule_names_and_odd_column_names(spark):
    """Rule names are labels, not identifiers: 'price > 0' or a dashed
    name must not be parsed as SQL by the report expression."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0,), (-2.0,)], "price double")
    rep = {
        r["check"]: r["n_violations"]
        for r in check_constraints(
            df, {"price > 0": F.col("price") > 0, "non-null price": F.col("price").isNotNull()}
        ).collect()
    }
    assert rep == {"price > 0": 1, "non-null price": 0}

    odd = df.withColumnRenamed("price", "unit price-usd")
    prof = profile_columns(odd, ["unit price-usd"]).first()
    assert prof["column"] == "unit price-usd" and prof["n_rows"] == 2
