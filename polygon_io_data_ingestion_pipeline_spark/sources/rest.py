"""Reference-data ingestion from a REST API (splits / dividends /
security master), distributed.

Reference: src/polygon_pullers/__init__.py — pullers 86-228, retry
wrapper ``_retrying_call`` 54-80 (5 retries, 0.5 s base, exponential
backoff, hard-fail on NOT_FOUND); legacy_scripts/corp_actions.py.

Design: the universe of tickers is a DataFrame; fetching is
``mapInPandas`` over it so a large universe fans out across executors,
each partition rate-limited independently. The HTTP client is injected
as a factory so tests (and this offline environment) use
``FakePolygonClient`` — a deterministic synthetic backend; the real
Polygon client drops in unchanged because only the factory differs.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SPLITS_SCHEMA = (
    "ticker string, execution_date timestamp_ntz, split_from double, split_to double, ratio double"
)
DIVIDENDS_SCHEMA = (
    "ticker string, ex_date timestamp_ntz, pay_date timestamp_ntz, cash_amount double, "
    "declaration_date timestamp_ntz, record_date timestamp_ntz, frequency bigint"
)
SECURITY_MASTER_SCHEMA = (
    "ticker string, name string, active boolean, cik string, locale string, "
    "currency_name string, primary_exchange string, market string, type string, "
    "list_date timestamp_ntz, updated timestamp_ntz, composite_figi string"
)


class RetryExhausted(RuntimeError):
    pass


def retrying_call(
    fn: Callable,
    *args,
    retries: int = 5,
    base_delay: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
    **kwargs,
):
    """Exponential backoff on transient errors; NOT_FOUND raises
    immediately (polygon_pullers/__init__.py:54-80)."""
    last: Exception | None = None
    for attempt in range(retries):
        try:
            return fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — mirror the reference's broad retry
            if "NOT_FOUND" in str(exc):
                raise
            last = exc
            sleep(base_delay * (2**attempt))
    raise RetryExhausted(f"gave up after {retries} attempts") from last


@dataclass
class FakePolygonClient:
    """Deterministic offline stand-in for the Polygon REST client.

    Synthesizes per-ticker refdata from md5 digests so results are
    stable across processes — used by tests and this offline container.
    """

    fail_tickers: tuple[str, ...] = ()

    def _h(self, *parts: str) -> int:
        return int(hashlib.md5("|".join(parts).encode()).hexdigest()[:8], 16)

    def list_splits(self, ticker: str) -> list[dict]:
        if ticker in self.fail_tickers:
            raise RuntimeError("NOT_FOUND")
        n = self._h(ticker, "ns") % 3
        out = []
        for i in range(n):
            frm, to = 1.0, float(2 + self._h(ticker, f"s{i}") % 4)
            day = 1 + self._h(ticker, f"sd{i}") % 28
            out.append(
                dict(
                    ticker=ticker,
                    execution_date=pd.Timestamp(2023, 1 + i * 3, day),
                    split_from=frm,
                    split_to=to,
                    ratio=to / frm,
                )
            )
        return out

    def list_dividends(self, ticker: str) -> list[dict]:
        if ticker in self.fail_tickers:
            raise RuntimeError("NOT_FOUND")
        n = self._h(ticker, "nd") % 4
        out = []
        for i in range(n):
            day = 1 + self._h(ticker, f"dd{i}") % 28
            ex = pd.Timestamp(2023, 1 + i * 2, day)
            out.append(
                dict(
                    ticker=ticker,
                    ex_date=ex,
                    pay_date=ex + pd.Timedelta(days=14),
                    cash_amount=round(0.1 + (self._h(ticker, f"da{i}") % 100) / 100, 2),
                    declaration_date=ex - pd.Timedelta(days=30),
                    record_date=ex + pd.Timedelta(days=1),
                    frequency=4,
                )
            )
        return out

    def ticker_details(self, ticker: str) -> dict:
        if ticker in self.fail_tickers:
            raise RuntimeError("NOT_FOUND")
        return dict(
            ticker=ticker,
            name=f"{ticker} Corp",
            active=True,
            cik=str(100000 + self._h(ticker, "cik") % 900000),
            locale="us",
            currency_name="usd",
            primary_exchange="XNAS",
            market="stocks",
            type="CS",
            list_date=pd.Timestamp(2000, 1, 1),
            updated=pd.Timestamp(2024, 1, 1),
            composite_figi=f"FIGI{self._h(ticker, 'figi'):08d}",
        )


def _pull(
    spark_or_df,
    method: str,
    schema: str,
    client_factory: Callable,
    rate_limit_s: float,
    scalar: bool,
    include_status: bool = False,
    fail_on_missing: bool = False,
    retry_kwargs: dict | None = None,
) -> DataFrame:
    """Fetch per-ticker refdata with a full audit trail.

    Every ticker produces either data rows (``fetch_status='ok'``) or
    one status row (``not_found`` / ``retry_exhausted`` / ``error``
    with null data columns) — mirroring the reference's ``missing``
    list + ``fail_on_missing``/``missing_out`` contract
    (polygon_pullers/__init__.py:95-139, run_pullers.py:65-152).
    ``fail_on_missing`` re-raises RetryExhausted instead of recording
    it; by default status rows are filtered out and the caller gets
    clean data (set ``include_status`` to audit).
    """
    tickers_df = spark_or_df
    out_schema = schema + ", fetch_status string"
    cols = [f.strip().split()[0] for f in out_schema.split(",")]
    rkw = retry_kwargs or {}

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one client per task, like one per worker
        for batch in batches:
            rows: list[dict] = []
            for ticker in batch["ticker"]:
                t = str(ticker)
                try:
                    res = retrying_call(getattr(client, method), t, **rkw)
                except RetryExhausted:
                    if fail_on_missing:
                        raise
                    rows.append({"ticker": t, "fetch_status": "retry_exhausted"})
                    continue
                except Exception as exc:  # noqa: BLE001 — NOT_FOUND et al.
                    status = "not_found" if "NOT_FOUND" in str(exc) else "error"
                    rows.append({"ticker": t, "fetch_status": status})
                    continue
                for r in [res] if scalar else res:
                    rows.append({**r, "fetch_status": "ok"})
                if rate_limit_s:
                    time.sleep(rate_limit_s)
            out = pd.DataFrame(rows)
            for c in cols:
                if c not in out.columns:
                    out[c] = None
            yield out[cols]

    df = tickers_df.mapInPandas(fetch, schema=out_schema)
    if include_status:
        return df
    return df.filter("fetch_status = 'ok'").drop("fetch_status")


def pull_splits(tickers: DataFrame, client_factory=FakePolygonClient, rate_limit_s: float = 0.0, **kw) -> DataFrame:
    return _pull(tickers, "list_splits", SPLITS_SCHEMA, client_factory, rate_limit_s, scalar=False, **kw)


def pull_dividends(tickers: DataFrame, client_factory=FakePolygonClient, rate_limit_s: float = 0.0, **kw) -> DataFrame:
    return _pull(tickers, "list_dividends", DIVIDENDS_SCHEMA, client_factory, rate_limit_s, scalar=False, **kw)


def pull_security_master(tickers: DataFrame, client_factory=FakePolygonClient, rate_limit_s: float = 0.0, **kw) -> DataFrame:
    return _pull(tickers, "ticker_details", SECURITY_MASTER_SCHEMA, client_factory, rate_limit_s, scalar=True, **kw)


def ticker_universe(spark: SparkSession, symbols: list[str]) -> DataFrame:
    """Small driver-side universe -> 1-column DataFrame, repartitioned so
    fetch work spreads across the cluster."""
    norm = sorted({s.strip().upper() for s in symbols})
    parallelism = max(1, min(len(norm), spark.sparkContext.defaultParallelism))
    return spark.createDataFrame([(s,) for s in norm], "ticker string").repartition(parallelism)
