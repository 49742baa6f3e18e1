"""Analysis-frame loaders: unadjusted × adjusted series merge, event
loading, audit summary, and the split-window backfill job.

Reference: src/polygon_ingest/lake_io.py:479-568 (`load_series` /
`load_events`), legacy_scripts/factor_builder.py:568-643
(`_event_summary`), scripts/emit_split_backfill_cmds.py (±14-day
re-adjust windows). The reference's per-ticker file walks and pandas
merges become two pruned lake reads and one join.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .lake import read_lake

#: factor_builder's *_split columns -> canonical *_sa aliases
SPLIT_TO_SA = {
    "open_split": "open_sa",
    "high_split": "high_sa",
    "low_split": "low_sa",
    "close_split": "close_sa",
    "volume_split": "volume_sa",
}
BASE_COLS = ("datetime", "ticker", "open", "high", "low", "close", "volume", "vwap")
ADJ_COLS = ("open_sa", "high_sa", "low_sa", "close_sa", "vwap_sa", "volume_sa", "close_tr")


def load_series(
    spark: SparkSession,
    unadj_root: str,
    adj_root: str,
    tf: str,
    tickers: Iterable[str] | None = None,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Unadjusted bars left-joined with their adjusted columns.

    Day granularity joins on the calendar date (lake_io.py:500-506),
    minute on the exact timestamp (509-511); *_split columns are
    harmonized to *_sa. Both sides are partition-pruned reads.
    """
    un = read_lake(spark, unadj_root, tickers=tickers, start=start, end=end)
    ad = read_lake(spark, adj_root, tickers=tickers, start=start, end=end)
    return join_series(un, ad, tf)


def join_series(un: DataFrame, ad: DataFrame, tf: str) -> DataFrame:
    """The load_series merge core: unadjusted bars left-joined with
    adjusted columns — on calendar date for day granularity
    (lake_io.py:500-506), on exact timestamp for minute (509-511).
    Exposed separately so the join semantics are oracle-testable
    without lake directories."""
    for src, dst in SPLIT_TO_SA.items():
        if dst not in ad.columns and src in ad.columns:
            ad = ad.withColumn(dst, F.col(src))

    left = un.select(*[c for c in BASE_COLS if c in un.columns])
    if tf == "day":
        left = left.withColumn("__d", F.to_date("datetime"))
        right = ad.select(
            F.to_date("datetime").alias("__d"),
            F.col("ticker").alias("__t"),
            *[c for c in ADJ_COLS if c in ad.columns],
        )
        out = left.join(
            right, (left["__d"] == right["__d"]) & (left["ticker"] == right["__t"]), "left"
        ).drop("__d", "__t")
    else:
        right = ad.select(
            F.col("datetime").alias("__dt"),
            F.col("ticker").alias("__t"),
            *[c for c in ADJ_COLS if c in ad.columns],
        )
        out = left.join(
            right, (left["datetime"] == right["__dt"]) & (left["ticker"] == right["__t"]), "left"
        ).drop("__dt", "__t")
    return out


SPLIT_DATE_ALIASES = ("execution_date", "effective_date", "split_date", "date")
DIV_DATE_ALIASES = ("ex_date", "ex_dividend_date", "exDividendDate", "exDate", "date")


def load_events(
    spark: SparkSession, refdir: str, tickers: Iterable[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """(splits, dividends) with alias-normalized dates and derived ratio
    (lake_io.py:525-568)."""

    def _norm_date(df: DataFrame, aliases: tuple[str, ...], out: str) -> DataFrame:
        src = next((c for c in aliases if c in df.columns), None)
        if src is None:
            return df.withColumn(out, F.lit(None).cast("timestamp_ntz"))
        col = F.col(src).cast("timestamp_ntz")
        return df.withColumn(out, col) if src != out else df

    splits = spark.read.parquet(f"{refdir}/stock_splits.parquet")
    divs = spark.read.parquet(f"{refdir}/cash_dividends.parquet")
    splits = _norm_date(splits.withColumn("ticker", F.upper("ticker")), SPLIT_DATE_ALIASES, "execution_date")
    divs = _norm_date(divs.withColumn("ticker", F.upper("ticker")), DIV_DATE_ALIASES, "ex_date")
    if "ratio" not in splits.columns and {"split_from", "split_to"} <= set(splits.columns):
        sf_, st_ = F.col("split_from").cast("double"), F.col("split_to").cast("double")
        splits = splits.withColumn(
            "ratio", F.when((sf_ > 0) & st_.isNotNull(), st_ / sf_)
        )
    if tickers is not None:
        keys = sorted({t.strip().upper() for t in tickers})
        splits = splits.filter(F.col("ticker").isin(keys))
        divs = divs.filter(F.col("ticker").isin(keys))
    return splits, divs


def event_summary(adjusted: DataFrame) -> DataFrame:
    """Per-id audit row mirroring `_event_summary.csv`
    (factor_builder.py:568-643): factor ranges, implied cumulative
    ratio, row/day counts and series bounds."""
    w = Window.partitionBy("id")
    return (
        adjusted.groupBy("id")
        .agg(
            F.first("ticker", ignorenulls=True).alias("ticker"),
            F.count("*").alias("n_rows"),
            F.countDistinct(F.to_date("datetime")).alias("n_days"),
            F.min("datetime").alias("first_bar"),
            F.max("datetime").alias("last_bar"),
            F.min("split_price_factor").alias("min_split_factor"),
            F.max("split_price_factor").alias("max_split_factor"),
            (F.lit(1.0) / F.min("split_price_factor")).alias("implied_cum_ratio"),
            F.min("tr_price_factor").alias("min_tr_factor"),
            F.max("tr_price_factor").alias("max_tr_factor"),
        )
    )


def backfill_split_windows(
    bars: DataFrame,
    security_master: DataFrame,
    splits: DataFrame,
    dividends: DataFrame,
    new_splits: DataFrame,
    window_days: int = 14,
    **adjust_kwargs,
) -> DataFrame:
    """Recompute adjusted bars only for tickers with new split events —
    the reference's ±window backfill job (emit_split_backfill_cmds.py).

    Factor math must see each id's FULL calendar (normalize-to-last
    anchoring makes every new event re-price all history), so the
    affected tickers are fully re-adjusted, then the output is
    restricted to the ±window around each new event — matching the
    reference's re-emitted date windows, ready for dynamic partition
    overwrite.
    """
    from ..operators.factors import adjust_bars, prep_splits

    ev = prep_splits(new_splits).select(
        "ticker", F.col("execution_date").alias("ev_day")
    )
    affected = ev.select("ticker").distinct()
    scoped = bars.join(F.broadcast(affected), "ticker", "left_semi")
    adjusted = adjust_bars(scoped, security_master, splits, dividends, **adjust_kwargs)
    in_window = adjusted.join(
        F.broadcast(ev),
        (adjusted["ticker"] == ev["ticker"])
        & (
            F.abs(F.datediff(F.to_date(adjusted["datetime"]), F.col("ev_day")))
            <= window_days
        ),
        "left_semi",
    )
    return in_window
