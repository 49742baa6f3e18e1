"""build_dividend_factors' end-of-day aggregate: two-level hash shape.

``first(ticker)`` in an aggregation BUFFER is a string Spark cannot
hash-aggregate — the whole full-bar pass would fall back to
SortAggregate (a sort of every scanned partition before the partial
agg; spill-prone at 100 TB).  The operator therefore keeps ticker as a
LEVEL-1 GROUP KEY (keys may be strings) and resolves the per-day pick
at level 2 over the calendar-sized frame — the same shape
``day_calendar`` adopted in round 13.  These tests pin (a) the plan:
no SortAggregate anywhere in the operator's lineage, and (b) value
equality with the direct one-level formulation on a multi-day fixture
with dividends, a same-day dividend pair, and an id with no events.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.operators.factors import (
    build_dividend_factors,
    cumprod,
    normalize_to_last,
    prep_dividends,
)

D = dt.datetime.fromisoformat


@pytest.fixture(scope="module")
def bars_split(spark):
    rows = []
    for tick, gid in (("AAA", "FIGI_AAA"), ("BBB", "NOFIGI__BBB")):
        for d_i, day in enumerate(
            ["2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"]
        ):
            for minute in (30, 45):  # two bars per day: max_by must pick 45
                px = 100.0 + d_i + minute / 100.0
                rows.append(
                    (
                        D(f"{day}T15:{minute}:00"),
                        dt.date.fromisoformat(day),
                        tick,
                        gid,
                        px,
                        px * 0.5,
                        10.0,
                    )
                )
    return spark.createDataFrame(
        rows,
        "datetime timestamp, event_day date, ticker string, id string, "
        "close double, close_split double, volume double",
    ).localCheckpoint()


@pytest.fixture(scope="module")
def dividends(spark):
    return spark.createDataFrame(
        [
            ("AAA", None, D("2024-01-03T00:00:00"), 0.30),
            ("AAA", None, D("2024-01-03T00:00:00"), 0.20),  # same-day pair: sums
            ("AAA", None, D("2024-01-06T00:00:00"), 0.10),  # after last bar: drops
        ],
        "ticker string, composite_figi string, ex_date timestamp, cash_amount double",
    )


def test_no_sort_aggregate_in_plan(spark, bars_split, dividends):
    # The operator's own plan reads the localCheckpoint-materialized
    # calendar: no SortAggregate anywhere downstream, and the bar table
    # never re-enters the lineage (the lazy-checkpoint fix: without it
    # the event-routing leg re-derived a first(ticker)-over-scan
    # SortAggregate from the bars THREE times via _events_for_ids).
    plan = (
        build_dividend_factors(bars_split, prep_dividends(dividends))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortAggregate" not in plan, plan


def test_calendar_full_bar_pass_is_hash_shaped(spark, bars_split):
    # The one full-bar pass (day_calendar level 1) must be a
    # partial-combining HashAggregate; the unavoidable first(ticker)
    # SortAggregate may only appear ABOVE it (calendar-sized, after the
    # level-1 exchange), never directly over the bar scan.
    from polygon_io_data_ingestion_pipeline_spark.operators.factors import (
        day_calendar,
    )

    lines = (
        day_calendar(bars_split.withColumn("close", F.col("close_split")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .splitlines()
    )
    assert any(
        "HashAggregate" in l and "partial_max_by" in l for l in lines
    ), "\n".join(lines)
    for i, l in enumerate(lines):
        if "SortAggregate" in l and "partial_first" in l:
            below = lines[i + 1 :]
            hash_i = next(
                j for j, x in enumerate(below) if "HashAggregate" in x
            )
            scan_i = next(j for j, x in enumerate(below) if "Scan" in x)
            assert hash_i < scan_i, "\n".join(lines)


def test_matches_one_level_formulation(spark, bars_split, dividends):
    got = {
        (r["id"], r["event_day"]): r["tr_price_factor"]
        for r in build_dividend_factors(
            bars_split, prep_dividends(dividends)
        ).collect()
    }

    # the pre-round-14 one-level formulation, inlined
    from polygon_io_data_ingestion_pipeline_spark.operators.factors import (
        _align_forward,
        _events_for_ids,
    )

    wday = Window.partitionBy("id").orderBy("event_day")
    cal = (
        bars_split.groupBy("id", "event_day")
        .agg(
            F.max_by("close_split", "datetime").alias("base"),
            F.first("ticker", ignorenulls=True).alias("ticker"),
        )
        .withColumn("prior_base", F.lag("base").over(wday))
    )
    dv = prep_dividends(dividends)
    ev = _events_for_ids(cal.select("id", "ticker").distinct(), dv, "ex_date", "amount")
    aligned = _align_forward(ev, cal.select("id", "event_day"), "ex_date", "amount")
    per_day = aligned.groupBy("id", "event_day").agg(F.sum("amount").alias("amount"))
    t = cal.join(per_day, ["id", "event_day"], "left")
    g = F.when(
        F.col("amount").isNotNull()
        & F.col("prior_base").isNotNull()
        & (F.col("prior_base") > 0),
        (F.col("prior_base") - F.col("amount")) / F.col("prior_base"),
    ).otherwise(F.lit(1.0))
    t = t.withColumn("G", cumprod(g, wday))
    want = {
        (r["id"], r["event_day"]): r["trf"]
        for r in t.select(
            "id", "event_day", normalize_to_last(F.col("G"), wday).alias("trf")
        ).collect()
    }

    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])
    # sanity: the dividend actually moved AAA's factors, BBB untouched
    aaa = [v for (gid, _), v in got.items() if gid == "FIGI_AAA"]
    bbb = [v for (gid, _), v in got.items() if gid == "NOFIGI__BBB"]
    assert any(v != 1.0 for v in aaa)
    assert all(v == 1.0 for v in bbb)
