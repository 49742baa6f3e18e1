"""Command-line interface — the reference's `poly` CLI surface
(reference: src/polygon_ingest/cli.py `bars`/`actions`; plus the
factor-builder and loader entry points that live in shell scripts
there) as one argparse program:

    python -m polygon_io_data_ingestion_pipeline_spark bars    --src G --out L --tf day
    python -m polygon_io_data_ingestion_pipeline_spark actions --tickers AAPL,MSFT --out R
    python -m polygon_io_data_ingestion_pipeline_spark adjust  --lake L --refdir R --out A
    python -m polygon_io_data_ingestion_pipeline_spark load    --lake L --adj A --tf day --out f.parquet
"""

from __future__ import annotations

import argparse
import sys

from .session import get_spark
from .sources.csv_bars import read_bar_flatfiles
from .sources.lake import read_lake, write_lake
from .sources.rest import (
    FakePolygonClient,
    pull_dividends,
    pull_security_master,
    pull_splits,
    ticker_universe,
)
from .sources.series import load_series
from .sources.watchlist import load_watchlist


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")


def cmd_bars(args: argparse.Namespace) -> int:
    spark = get_spark("poly-bars", master=args.master)
    watch = load_watchlist(args.watchlist) if args.watchlist else None
    bars = read_bar_flatfiles(spark, args.src, tf=args.tf, only=args.only, watchlist=watch)
    write_lake(bars, args.out, tf=args.tf)
    print(f"ingested -> {args.out}")
    return 0


def cmd_actions(args: argparse.Namespace) -> int:
    spark = get_spark("poly-actions", master=args.master)
    symbols = (
        sorted(load_watchlist(args.watchlist))
        if args.watchlist
        else [t for t in args.tickers.split(",") if t]
    )
    uni = ticker_universe(spark, symbols)
    factory = FakePolygonClient  # real Polygon client drops in here
    pull_splits(uni, client_factory=factory).write.mode("overwrite").parquet(
        f"{args.out}/stock_splits.parquet"
    )
    pull_dividends(uni, client_factory=factory).write.mode("overwrite").parquet(
        f"{args.out}/cash_dividends.parquet"
    )
    pull_security_master(uni, client_factory=factory).write.mode("overwrite").parquet(
        f"{args.out}/security_master.parquet"
    )
    print(f"refdata -> {args.out}")
    return 0


def cmd_adjust(args: argparse.Namespace) -> int:
    from .operators.factors import adjust_bars

    spark = get_spark("poly-adjust", master=args.master)
    bars = read_lake(spark, args.lake)
    sm = spark.read.parquet(f"{args.refdir}/security_master.parquet")
    splits = spark.read.parquet(f"{args.refdir}/stock_splits.parquet")
    divs = spark.read.parquet(f"{args.refdir}/cash_dividends.parquet")
    from pyspark.sql import functions as F

    adjusted = adjust_bars(bars, sm, splits, divs, materialize=args.materialize)
    # partition keys for the adjusted lake mirror the unadjusted one
    adjusted = adjusted.withColumn("year", F.year("datetime")).withColumn(
        "month", F.month("datetime")
    )
    write_lake(adjusted, args.out, tf="day")
    print(f"adjusted lake -> {args.out}")
    return 0


def cmd_load(args: argparse.Namespace) -> int:
    spark = get_spark("poly-load", master=args.master)
    tickers = args.tickers.split(",") if args.tickers else None
    df = load_series(
        spark, args.lake, args.adj, tf=args.tf, tickers=tickers, start=args.start, end=args.end
    )
    out = args.out
    # export switch by suffix (reference lake_io.py:391-401:
    # csv / feather / parquet)
    if out.endswith(".csv"):
        df.coalesce(1).write.option("header", True).mode("overwrite").csv(out)
    elif out.endswith(".feather"):
        # Feather is a single-machine analysis format; the reference
        # writes it with pandas. Arrow conversion keeps it exact.
        df.toPandas().to_feather(out)
    else:
        df.write.mode("overwrite").parquet(out)
    print(f"series -> {out}")
    return 0


def cmd_index(args: argparse.Namespace) -> int:
    """Explicit ANN index build: embeddings parquet -> materialized IVF
    index (corpus partitioned by inverted list + codebook.json sidecar)
    at a lake path. Probing via ivf_topk_indexed then partition-prunes
    to nprobe/nlist of the corpus."""
    from .operators.similarity import build_ivf_index

    spark = get_spark("poly-index", master=args.master)
    emb = spark.read.parquet(args.embeddings)
    build_ivf_index(emb, args.out, nlist=args.nlist, stride=args.stride)
    print(f"ivf index -> {args.out}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="polygon-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("bars", help="flat files -> unadjusted lake")
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--tf", choices=["day", "minute"], default="day")
    p.add_argument("--only", default=None)
    p.add_argument("--watchlist", default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_bars)

    p = sub.add_parser("actions", help="pull splits/dividends/security master")
    p.add_argument("--tickers", default="")
    p.add_argument("--watchlist", default=None)
    p.add_argument("--out", required=True)
    _add_common(p)
    p.set_defaults(fn=cmd_actions)

    p = sub.add_parser("adjust", help="unadjusted lake + refdata -> adjusted lake")
    p.add_argument("--lake", required=True)
    p.add_argument("--refdir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--materialize", choices=["minimal", "close", "ohlc"], default="ohlc")
    _add_common(p)
    p.set_defaults(fn=cmd_adjust)

    p = sub.add_parser("load", help="unadjusted x adjusted analysis series")
    p.add_argument("--lake", required=True)
    p.add_argument("--adj", required=True)
    p.add_argument("--tf", choices=["day", "minute"], default="day")
    p.add_argument("--tickers", default=None)
    p.add_argument("--start", default=None)
    p.add_argument("--end", default=None)
    p.add_argument("--out", required=True)
    _add_common(p)
    p.set_defaults(fn=cmd_load)

    p = sub.add_parser("index", help="embeddings parquet -> materialized IVF ANN index")
    p.add_argument("--embeddings", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--nlist", type=int, default=16)
    p.add_argument("--stride", type=int, default=31)
    _add_common(p)
    p.set_defaults(fn=cmd_index)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
