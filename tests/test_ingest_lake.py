"""End-to-end ingest: CSV.GZ flat files -> partitioned lake -> pruned
read-back, including alias/shorthand headers, epoch-unit inference,
watchlist filtering, idempotent overwrite, and streaming AvailableNow.
"""

from __future__ import annotations

import glob
import gzip
import os

import pytest

from polygon_io_data_ingestion_pipeline_spark.sources.csv_bars import (
    read_bar_flatfiles,
    resolve_bar_columns,
)
from polygon_io_data_ingestion_pipeline_spark.sources.lake import (
    lake_manifest,
    read_lake,
    write_lake,
)
from polygon_io_data_ingestion_pipeline_spark.streaming import (
    stream_ingest_bars,
    write_ingest_batch,
)

NS_DAY = 86_400_000_000_000
BASE_NS = 1_704_153_600_000_000_000  # 2024-01-02 00:00:00 UTC in ns


def _write_flatfiles(root: str) -> None:
    os.makedirs(f"{root}/2024/01", exist_ok=True)
    # long-form header, ns epochs
    lines = ["ticker,volume,open,close,high,low,window_start,transactions"]
    for d in range(3):
        for i, t in enumerate(["aapl", "MSFT", "NVDA"]):
            px = 100 + 10 * i + d
            lines.append(f"{t},{1000+d},{px-1},{px},{px+1},{px-2},{BASE_NS + d*NS_DAY},{10+d}")
    with gzip.open(f"{root}/2024/01/2024-01-02.csv.gz", "wt") as f:
        f.write("\n".join(lines))
    # shorthand header, ms epochs (different unit in the same lake)
    lines = ["T,t,o,h,l,c,v,n,vw"]
    base_ms = (BASE_NS // 1_000_000) + 3 * 86_400_000
    for i, t in enumerate(["AAPL", "MSFT"]):
        px = 103 + 10 * i
        lines.append(f"{t},{base_ms},{px-1},{px+1},{px-2},{px},{2000},{40},{px+0.5}")
    with gzip.open(f"{root}/2024/01/2024-01-05.csv.gz", "wt") as f:
        f.write("\n".join(lines))


def test_resolve_candidates():
    ts, tick, ren = resolve_bar_columns(["T", "t", "o", "h", "l", "c", "v", "n", "vw"])
    assert (ts, tick) == ("t", "T")
    assert ren == {"o": "open", "h": "high", "l": "low", "c": "close",
                   "v": "volume", "n": "transactions", "vw": "vwap"}
    with pytest.raises(ValueError):
        resolve_bar_columns(["ticker", "open", "close"])  # no ts candidate


def test_batch_ingest_roundtrip(spark, tmp_path):
    src, lake = str(tmp_path / "src"), str(tmp_path / "lake")
    _write_flatfiles(src)

    bars = read_bar_flatfiles(spark, f"{src}/*/*/*.csv.gz", tf="day", watchlist=["aapl", "msft"])
    write_lake(bars, lake, tf="day")

    # watchlist filter dropped NVDA; case folded
    back = read_lake(spark, lake)
    assert set(r["ticker"] for r in back.select("ticker").distinct().collect()) == {"AAPL", "MSFT"}
    # both epoch units landed on the same calendar
    days = sorted(
        r["d"] for r in back.selectExpr("to_date(datetime) AS d").distinct().collect()
    )
    assert str(days[0]) == "2024-01-02" and str(days[-1]) == "2024-01-05"
    # partition layout is ticker=/year=/month=
    assert glob.glob(f"{lake}/ticker=AAPL/year=2024/month=1/*.parquet")

    # pruned read: ticker + date range push down to partitions
    one = read_lake(spark, lake, tickers=["AAPL"], start="2024-01-03", end="2024-01-04")
    rows = one.select("ticker", "close").collect()
    assert {r["ticker"] for r in rows} == {"AAPL"} and len(rows) == 2
    # date-only end bound is inclusive through end of day
    incl = read_lake(spark, lake, tickers=["MSFT"], start="2024-01-05", end="2024-01-05")
    assert incl.count() == 1

    # idempotent re-ingest: same input overwrites same partitions
    n_before = back.count()
    write_lake(bars, lake, tf="day")
    assert read_lake(spark, lake).count() == n_before

    mani = lake_manifest(spark, lake).collect()
    assert sum(r["rows"] for r in mani) == n_before
    assert all(r["start"] <= r["end"] for r in mani)


def test_distributed_lines_mode_matches_native_scan(spark, tmp_path):
    """O(groups)-driver-memory mode: executor-side line streaming +
    JVM from_csv parse must produce exactly the native per-group scan's
    rows (mixed headers, mixed epoch units)."""
    src = str(tmp_path / "src")
    _write_flatfiles(src)
    pat = f"{src}/*/*/*.csv.gz"

    native = read_bar_flatfiles(spark, pat, tf="day").collect()
    dist = read_bar_flatfiles(spark, pat, tf="day", distributed_lines=True).collect()

    key = lambda r: (r["ticker"], r["datetime"])  # noqa: E731
    assert sorted(map(tuple, dist), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, native), key=lambda t: (t[0], t[1])
    )
    assert len({key(r) for r in native}) == len(native)


def test_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_bar_flatfiles(spark, f"{tmp_path}/nowhere/*.csv.gz")


def test_streaming_available_now(spark, tmp_path):
    src, lake, ckpt = str(tmp_path / "s"), str(tmp_path / "l"), str(tmp_path / "c")
    _write_flatfiles(src)
    # file-source streams require one header layout per glob: target the
    # long-form file only (2024-01-02); the shorthand file is batch work
    q = stream_ingest_bars(spark, f"{src}/*/*/2024-01-02.csv.gz", lake, ckpt, tf="day")
    q.awaitTermination(120)
    n1 = read_lake(spark, lake).count()
    assert n1 == 9  # 9 long-form rows

    # new file arrives -> only the delta is processed on the next drain
    import gzip as gz

    with gz.open(f"{src}/2024/01/2024-01-08.csv.gz", "wt") as f:
        f.write("ticker,volume,open,close,high,low,window_start,transactions\n")
        f.write(f"AAPL,500,99,100,101,98,{BASE_NS + 6*NS_DAY},5\n")
    q2 = stream_ingest_bars(
        spark, f"{src}/*/*/2024-01-0[28].csv.gz", lake, ckpt, tf="day"
    )
    q2.awaitTermination(120)
    # checkpoint remembers the first file: only the new one is appended
    assert read_lake(spark, lake).count() == n1 + 1


def test_stream_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch must overwrite
    its own prior output, not append duplicates."""
    src, lake = str(tmp_path / "s"), str(tmp_path / "l")
    _write_flatfiles(src)
    bars = read_bar_flatfiles(spark, f"{src}/*/*/2024-01-02.csv.gz", tf="day")

    write_ingest_batch(bars, 0, lake, tf="day")
    n = read_lake(spark, lake).count()
    assert n == 9
    write_ingest_batch(bars, 0, lake, tf="day")  # simulated replay
    assert read_lake(spark, lake).count() == n
    # a genuinely new batch still appends alongside
    write_ingest_batch(bars.limit(1), 1, lake, tf="day")
    assert read_lake(spark, lake).count() == n + 1
