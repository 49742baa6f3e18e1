"""Hard per-group cap (max N rows per domain): deterministic keyed-hash
selection, groups under the cap pass through whole, and the plan carries
Spark's WindowGroupLimit so hot domains never materialize in one window
partition."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.sampling import (
    group_capped_sample,
)


def _rows(spark):
    rows = [(i, "big.example" if i < 40 else f"small{i}.example") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, domain string")


def test_cap_applies_per_group(spark):
    got = group_capped_sample(_rows(spark), cap=5, group_col="domain").collect()
    by_dom: dict[str, int] = {}
    for r in got:
        by_dom[r["domain"]] = by_dom.get(r["domain"], 0) + 1
    assert by_dom["big.example"] == 5          # capped
    assert sum(1 for d in by_dom if d != "big.example") == 10
    assert all(v == 1 for d, v in by_dom.items() if d != "big.example")


def test_selection_is_deterministic_across_partitionings(spark):
    a = {
        r["doc_id"]
        for r in group_capped_sample(
            _rows(spark).repartition(7), cap=5, group_col="domain"
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in group_capped_sample(
            _rows(spark).coalesce(1), cap=5, group_col="domain"
        ).collect()
    }
    assert a == b


def test_kept_set_stable_when_other_groups_grow(spark):
    """Adding rows to OTHER groups never changes a group's kept set."""
    base = _rows(spark)
    grown = base.union(
        base.sparkSession.createDataFrame(
            [(1000 + i, "newcomer.example") for i in range(20)],
            "doc_id long, domain string",
        )
    )
    kept = lambda df: {  # noqa: E731
        r["doc_id"]
        for r in group_capped_sample(df, cap=5, group_col="domain").collect()
        if r["domain"] == "big.example"
    }
    assert kept(base) == kept(grown)


def test_plan_has_window_group_limit_and_no_python(spark):
    """The rank<=cap filter must push into a partial per-map top-cap
    (WindowGroupLimit) — the node that makes the plan survive Zipfian
    domain skew — and the whole pipeline stays JVM-side."""
    plan = (
        group_capped_sample(_rows(spark), cap=5, group_col="domain")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "EvalPython" not in plan
