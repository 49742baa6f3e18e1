"""Full user journey through the CLI surface: ingest flat files, pull
refdata, build the adjusted lake, load the merged analysis series —
plus event_summary and the split-window backfill job."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.cli import main as cli_main
from polygon_io_data_ingestion_pipeline_spark.operators.factors import adjust_bars
from polygon_io_data_ingestion_pipeline_spark.sources.lake import read_lake
from polygon_io_data_ingestion_pipeline_spark.sources.series import (
    backfill_split_windows,
    event_summary,
    load_events,
    load_series,
)

NS_DAY = 86_400_000_000_000
BASE_NS = 1_704_153_600_000_000_000  # 2024-01-02 UTC


@pytest.fixture(scope="module")
def pipeline_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    src, lake, ref, adj = (str(root / d) for d in ("src", "lake", "ref", "adj"))
    os.makedirs(f"{src}/2024/01", exist_ok=True)
    lines = ["ticker,volume,open,close,high,low,window_start,transactions"]
    for d in range(5):
        for i, t in enumerate(["AAPL", "MSFT"]):
            px = 100 + 10 * i + d
            lines.append(
                f"{t},{1000+d},{px-1},{px},{px+1},{px-2},{BASE_NS + d*NS_DAY},{10+d}"
            )
    with gzip.open(f"{src}/2024/01/bars.csv.gz", "wt") as f:
        f.write("\n".join(lines))

    assert cli_main(["bars", "--src", f"{src}/*/*/*.csv.gz", "--out", lake, "--tf", "day"]) == 0
    assert cli_main(["actions", "--tickers", "AAPL,MSFT", "--out", ref]) == 0
    assert cli_main(["adjust", "--lake", lake, "--refdir", ref, "--out", adj]) == 0
    return src, lake, ref, adj


def test_cli_pipeline_and_load(spark, pipeline_dirs, tmp_path):
    src, lake, ref, adj = pipeline_dirs
    out = str(tmp_path / "series.parquet")
    assert cli_main(
        ["load", "--lake", lake, "--adj", adj, "--tf", "day", "--tickers", "AAPL", "--out", out]
    ) == 0
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert {"close", "close_sa", "close_tr", "volume_sa"} <= set(got.columns)
    # adjusted close equals raw close on the final bar (normalize-to-last)
    last = got.orderBy(F.desc("datetime")).first()
    assert abs(last["close_sa"] - last["close"]) < 1e-6


def test_cli_load_feather_export(pipeline_dirs, tmp_path):
    import pandas as pd

    _, lake, _, adj = pipeline_dirs
    out = str(tmp_path / "series.feather")
    assert cli_main(
        ["load", "--lake", lake, "--adj", adj, "--tf", "day", "--tickers", "MSFT", "--out", out]
    ) == 0
    got = pd.read_feather(out)
    assert len(got) == 5
    assert {"close", "close_sa", "close_tr"} <= set(got.columns)


def test_load_events_alias_normalization(spark, pipeline_dirs):
    _, _, ref, _ = pipeline_dirs
    splits, divs = load_events(spark, ref, tickers=["AAPL", "MSFT"])
    assert "execution_date" in splits.columns and "ratio" in splits.columns
    assert "ex_date" in divs.columns
    assert set(r["ticker"] for r in splits.select("ticker").distinct().collect()) <= {"AAPL", "MSFT"}


def test_event_summary_and_backfill(spark, pipeline_dirs):
    _, lake, ref, _ = pipeline_dirs
    bars = read_lake(spark, lake)
    sm = spark.read.parquet(f"{ref}/security_master.parquet")
    splits = spark.read.parquet(f"{ref}/stock_splits.parquet")
    divs = spark.read.parquet(f"{ref}/cash_dividends.parquet")
    adjusted = adjust_bars(bars, sm, splits, divs, materialize="close")

    summary = {r["ticker"]: r for r in event_summary(adjusted).collect()}
    assert set(summary) == {"AAPL", "MSFT"}
    for r in summary.values():
        assert r["n_rows"] == 5 and r["n_days"] == 5
        assert r["max_split_factor"] <= 1.0 + 1e-9  # anchored to last bar

    # a brand-new split for AAPL on 2024-01-04 -> only AAPL rows within
    # ±2 days of it come back for re-emission
    new_split = spark.createDataFrame(
        [("AAPL", "2024-01-04", 1.0, 2.0)],
        "ticker string, execution_date string, split_from double, split_to double",
    ).withColumn("execution_date", F.to_timestamp("execution_date"))
    out = backfill_split_windows(
        bars, sm, splits, divs, new_split, window_days=2, materialize="close"
    )
    rows = out.select("ticker", F.to_date("datetime").alias("d")).collect()
    assert {r["ticker"] for r in rows} == {"AAPL"}
    assert all(abs((r["d"] - __import__("datetime").date(2024, 1, 4)).days) <= 2 for r in rows)
