"""Hot-key evidence for the factor engine: one security holding ~50%
of all bars must neither change results nor force a single-task
full-corpus window.

At 100 TB the adjust pipeline's per-id windows only ever run on
day-calendar/event-sized tables (small); the sole full-bar-table
computation keyed by the bare id is the batch re-anchor, which is why
it is aggregation-shaped (map-side combine absorbs the hot key) rather
than window-shaped. These tests pin (a) result equality between the
aggregation shape and the reference window formulation on a skewed
fixture, (b) end-to-end adjust correctness under skew, and (c) the
plan shape: partial HashAggregate + broadcast join-back, no Window
over the bar lineage keyed by id alone.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.factors import (
    adjust_bars,
    id_renorm_factors,
    renormalize_tr,
)

BARS_SCHEMA = (
    "datetime timestamp, ticker string, id long, close double, volume double"
)


@pytest.fixture(scope="module")
def skewed_bars(spark):
    """~4000 bars; id 1 (HOT) holds half of them, ids 2..40 share the rest."""
    hot = spark.range(2000).select(
        F.expr("timestamp'2024-01-02 09:30:00' + make_interval(0,0,0,0,0,id,0)").alias(
            "datetime"
        ),
        F.lit("HOT").alias("ticker"),
        F.lit(1).cast("long").alias("id"),
        (100.0 + F.col("id") % 17).alias("close"),
        F.lit(10.0).alias("volume"),
    )
    cold = spark.range(2000).select(
        F.expr("timestamp'2024-01-02 09:30:00' + make_interval(0,0,0,0,0,id,0)").alias(
            "datetime"
        ),
        F.concat(F.lit("C"), (F.col("id") % 39).cast("string")).alias("ticker"),
        (2 + F.col("id") % 39).cast("long").alias("id"),
        (50.0 + F.col("id") % 13).alias("close"),
        F.lit(5.0).alias("volume"),
    )
    return hot.unionByName(cold).localCheckpoint()


def _with_tr(bars):
    """Minimal bars_tr frame: a fake tr factor column to re-anchor."""
    return bars.withColumn("tr_price_factor", 1.0 + (F.col("id") % 3) / 10.0).withColumn(
        "close_tr", F.col("close") * F.col("tr_price_factor")
    )


def test_renormalize_agg_equals_window_formulation(spark, skewed_bars):
    """The aggregation-shaped re-anchor must reproduce the reference
    window formulation exactly on the skewed fixture."""
    bars_tr = _with_tr(skewed_bars)

    got = renormalize_tr(bars_tr, use_split_base=False)

    w = Window.partitionBy("id").orderBy("datetime").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    renorm = F.last("close_tr").over(w) / F.last("close").over(w)
    renorm = F.when(renorm.isNull() | (renorm == 0), F.lit(1.0)).otherwise(renorm)
    want = bars_tr.withColumn(
        "tr_price_factor", F.col("tr_price_factor") / renorm
    ).withColumn("close_tr", F.col("close") * F.col("tr_price_factor"))

    cols = ["id", "datetime", "tr_price_factor", "close_tr"]
    a = {(r["id"], r["datetime"]): (r["tr_price_factor"], r["close_tr"]) for r in got.select(cols).collect()}
    b = {(r["id"], r["datetime"]): (r["tr_price_factor"], r["close_tr"]) for r in want.select(cols).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], abs=1e-12)
        assert a[k][1] == pytest.approx(b[k][1], abs=1e-9)
    # the anchor: every id's final close_tr equals its final close
    finals = got.groupBy("id").agg(
        F.max_by("close_tr", "datetime").alias("tr"),
        F.max_by("close", "datetime").alias("base"),
    )
    for r in finals.collect():
        assert r["tr"] == pytest.approx(r["base"], rel=1e-12)


def test_renorm_plan_is_partial_agg_not_window(spark, skewed_bars):
    """Plan shape: the per-id anchors come from a HashAggregate with a
    partial_ mode (map-side combine — the skew absorber) and NO Window
    operator anywhere in that lineage."""
    bars_tr = _with_tr(skewed_bars)
    plan = (
        id_renorm_factors(bars_tr, "close")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max_by" in plan or "partial" in plan.lower(), plan
    assert "Window" not in plan, plan
    # and the full renormalize joins the tiny frame back as a broadcast
    full_plan = (
        renormalize_tr(bars_tr, use_split_base=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in full_plan, full_plan
    assert "Window" not in full_plan, full_plan


def test_adjust_bars_correct_under_hot_key(spark, skewed_bars):
    """End-to-end adjust on the skewed fixture: the hot ticker's split
    applies exactly as on a balanced corpus."""
    tickers = ["HOT"] + [f"C{i}" for i in range(39)]
    sm = spark.createDataFrame(
        [(t, f"FIGI_{t}", dt.datetime(2023, 1, 1), None) for t in tickers],
        "ticker string, composite_figi string, effective_start timestamp, "
        "effective_end timestamp",
    )
    splits = spark.createDataFrame(
        [("HOT", "FIGI_HOT", dt.datetime(2024, 1, 3), 1.0, 2.0)],
        "ticker string, composite_figi string, execution_date timestamp, "
        "split_from double, split_to double",
    )
    dividends = spark.createDataFrame(
        [],
        "ticker string, composite_figi string, ex_date timestamp, cash_amount double",
    )
    out = adjust_bars(
        skewed_bars.drop("id"),
        sm,
        splits,
        dividends,
        materialize="close",
        persist_intermediates=False,
    ).collect()
    hot = [r for r in out if r["ticker"] == "HOT"]
    cold = [r for r in out if r["ticker"] != "HOT"]
    assert len(hot) == 2000 and len(cold) == 2000
    cut = dt.datetime(2024, 1, 3)
    assert any(r["datetime"] < cut for r in hot)
    assert any(r["datetime"] >= cut for r in hot)
    for r in hot:
        want = r["close"] / 2.0 if r["datetime"] < cut else r["close"]
        assert r["close_split"] == pytest.approx(want, rel=1e-12), r
    for r in cold[:100]:
        assert r["close_split"] == pytest.approx(r["close"], rel=1e-12)
