"""BI aggregates over the domain star schema — the layer whose
materialized outputs are the reference's golden CSVs (Data Processed/).

  * COT positioning by date and player, and summed across players
    (A3; golden: 'COT_Long by date_actual and player.csv',
    'CO_Net and Short by date_actual.csv' — CIT_Net = CIT_Long +
    CIT_Short with shorts stored negated)
  * calendar spread max−min per date across contract months
    (A4; golden: 'Spead.csv' × 'NY prices.csv' — verified
    2020-01-02: 131.45 − 129.40 = 2.05)
  * MA50/MA200 price series (W4/W5; golden: 'MA50 MA200.csv') via the
    O(n) prefix-sum trailing means

Exact decimal accumulation throughout (functions/exact.py) so sums are
identical under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators.windows import with_trailing_means


def cot_totals_by_date(cot: DataFrame) -> DataFrame:
    """A3 — per date, positions summed across the 4 players.
    Input: (date_actual, player, cit_long ≥ 0, cit_short ≤ 0,
    cit_net = long + short)."""
    return (
        cot.groupBy("date_actual")
        .agg(
            dsum("cit_long").alias("cit_long"),
            dsum("cit_short").alias("cit_short"),
            dsum("cit_net").alias("cit_net"),
        )
    )


def cot_by_player(cot: DataFrame) -> DataFrame:
    """Golden per-player series, date-ordered, net re-derived (the
    long/short/net consistency the reference's outputs encode)."""
    return cot.select(
        "date_actual",
        "player",
        "cit_long",
        "cit_short",
        (F.col("cit_long") + F.col("cit_short")).alias("cit_net"),
    )


def price_spread_by_date(prices: DataFrame) -> DataFrame:
    """A4 — Spread_max_min per date across contract months
    (max − min of 'last'); equals |price(far mo) − price(near mo)| when
    exactly two months trade."""
    return prices.groupBy("date_actual").agg(
        (F.max("last") - F.min("last")).alias("spread_max_min"),
        F.count(F.lit(1)).alias("n_contracts"),
    )


def calendar_spread_by_date(prices: DataFrame) -> DataFrame:
    """The golden Spead.csv's ACTUAL semantics: farthest-month price
    minus nearest-month price per date — SIGNED, negative under
    backwardation (e.g. golden 2020-03-18 = −0.15, where max−min would
    give +0.15; full-file parity in tests/test_reference_goldens.py).
    One map-side-combinable aggregate via max_by/min_by on mo."""
    return prices.groupBy("date_actual").agg(
        (F.max_by("last", "mo") - F.min_by("last", "mo")).alias("spread_max_min"),
        F.count(F.lit(1)).alias("n_contracts"),
    )


def ma_series(prices: DataFrame) -> DataFrame:
    """W4/W5 — MA200/MA50/price per (mo, date): the 'MA50 MA200.csv'
    shape, computed O(n) via prefix sums."""
    w = Window.partitionBy("mo").orderBy("date_actual")
    out = with_trailing_means(
        prices.select("mo", "date_actual", "last"), "last", w, (200, 50)
    )
    return out.select("mo", "date_actual", F.col("last").alias("price"), "ma_200", "ma_50")


def ohlcv_bars(events: DataFrame) -> DataFrame:
    """Candlestick (OHLCV) bars per (user, hour) over the event stream
    — the resample step every trading desk runs on tick data (the
    reference charts daily OHLC from its price table; this derives the
    bars from raw ticks instead of ingesting them pre-built).

    One map-side-combinable aggregate, no window: open/close are
    min_by/max_by on a zero-padded ``epoch_micros || event_id`` string
    key — a total order that both engines (and any partitioning) agree
    on, so first/last tick is deterministic even with timestamp ties.
    Exactly one exchange on (user, bucket); at 100 TB the partial
    aggregates reduce each bucket to one row per map task before the
    shuffle, so shuffle volume is #buckets, not #ticks."""
    tick_key = F.format_string(
        "%020d%012d",
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.col("event_id"),
    )
    bucket = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00")
    return (
        events.groupBy(
            F.col("user_id"), bucket.alias("bar_hour")
        )
        .agg(
            F.min_by("value", tick_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tick_key).alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )
