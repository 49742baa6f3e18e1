"""Snapshot diff: add/remove/change classification, null-safe column
comparison, changed-column lists, and unchanged-row suppression."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.diff import snapshot_diff

SCHEMA = "id long, price double, status string"


def test_classification_and_changed_cols(spark):
    old = spark.createDataFrame(
        [
            (1, 10.0, "open"),  # unchanged
            (2, 20.0, "open"),  # price changes
            (3, 30.0, "open"),  # removed
            (5, 50.0, None),  # null -> value change
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "open"),
            (2, 21.5, "open"),
            (4, 40.0, "new"),  # added
            (5, 50.0, "closed"),
        ],
        SCHEMA,
    )
    got = {r["id"]: r for r in snapshot_diff(old, new, key_cols=("id",)).collect()}
    assert set(got) == {2, 3, 4, 5}  # 1 (unchanged) suppressed
    assert got[2]["change_type"] == "changed"
    assert got[2]["changed_cols"] == ["price"]
    assert got[3]["change_type"] == "removed"
    assert got[3]["changed_cols"] is None
    assert got[4]["change_type"] == "added"
    assert got[5]["change_type"] == "changed"
    assert got[5]["changed_cols"] == ["status"]


def test_null_equals_null_is_unchanged(spark):
    old = spark.createDataFrame([(1, None, None)], SCHEMA)
    new = spark.createDataFrame([(1, None, None)], SCHEMA)
    assert snapshot_diff(old, new, key_cols=("id",)).count() == 0


def test_multi_column_change_order_is_alphabetical(spark):
    old = spark.createDataFrame([(1, 1.0, "a")], SCHEMA)
    new = spark.createDataFrame([(1, 2.0, "b")], SCHEMA)
    row = snapshot_diff(old, new, key_cols=("id",)).collect()[0]
    assert row["changed_cols"] == ["price", "status"]


def test_compound_key(spark):
    schema = "k1 string, k2 long, v double"
    old = spark.createDataFrame([("a", 1, 1.0), ("a", 2, 2.0)], schema)
    new = spark.createDataFrame([("a", 1, 9.0), ("b", 1, 3.0)], schema)
    got = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in snapshot_diff(old, new, key_cols=("k1", "k2")).collect()
    }
    assert got == {("a", 1): "changed", ("a", 2): "removed", ("b", 1): "added"}
