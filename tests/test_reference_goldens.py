"""End-to-end parity with the reference's published outputs.

Two layers:

1. **Full-file reproduction** (skipped when /root/reference is absent):
   run THIS engine's operators over the reference's own published
   inputs and diff every row of the corresponding golden:
     * `bi.price_spread_by_date` over `NY prices.csv` must reproduce
       all 237 rows of `Spead.csv` (reference A4 semantics).
     * `bi.cot_totals_by_date` over the per-player COT files must
       reproduce all 467 rows of `CO_Net and Short by date_actual.csv`
       (reference A3 semantics, shorts stored negated).
   `MA50 MA200.csv` cannot be recomputed from published data — its
   200-row trailing window starts ~10 months before the published
   range — so MA semantics are pinned by the byte-stable golden below
   plus the prefix-mean property test (test_domain_goldens.py).

2. **Byte-stable goldens in tests/data**: the full pipeline
   (stg quotes → `ods.build_fact` → `bi.ma_series` /
   `bi.price_spread_by_date`) over a deterministic barchart-shaped
   fixture, formatted with repr()-precision floats and compared
   byte-for-byte against checked-in CSVs — any change to window frames,
   accumulation order, or join semantics breaks the bytes.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.plans import bi

REF = "/root/reference/Data Processed"
DATA = os.path.join(os.path.dirname(__file__), "data")

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not mounted"
)


# ------------------------------------------------ full-file reproduction


def _read_ref_csv(spark, name, schema):
    return (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .schema(schema)
        .csv(os.path.join(REF, name))
    )


@needs_reference
def test_spread_full_file_parity(spark):
    """calendar_spread_by_date over the reference's NY prices reproduces
    every row of Spead.csv — including the NEGATIVE spreads under
    backwardation (2020-03-18: −0.15) that prove the golden is
    far-month − near-month, not max − min."""
    prices = _read_ref_csv(
        spark, "NY prices.csv", "date_actual timestamp, mo int, last double"
    )
    # header is 'date_actual,mo,NY price'; schema binds by position
    got = {
        r["date_actual"]: r["spread_max_min"]
        for r in bi.calendar_spread_by_date(prices).collect()
    }
    want_df = _read_ref_csv(
        spark, "Spead.csv", "spread_max_min double, date_actual timestamp"
    )
    want = {r["date_actual"]: r["spread_max_min"] for r in want_df.collect()}
    assert len(want) == 237
    assert got.keys() == want.keys()
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9, (d, got[d], v)


@needs_reference
def test_cot_totals_full_file_parity(spark):
    """cot_totals_by_date over the reference's per-player long/short
    files reproduces every row of 'CO_Net and Short by date_actual.csv'
    (the golden's CIT_Net already carries the source's rounding — sums
    must match it exactly)."""
    longs = _read_ref_csv(
        spark,
        "COT_Long by date_actual and player.csv",
        "date_actual timestamp, cit_long double, player string",
    )
    shorts = _read_ref_csv(
        spark,
        "COT_Short by date_actual and player (1).csv",
        "date_actual timestamp, cit_short double, player string",
    )
    nets = _read_ref_csv(
        spark,
        "COT_Short by date_actual and player (2).csv",
        "date_actual timestamp, cit_net double, player string",
    )
    cot = longs.join(shorts, ["date_actual", "player"]).join(
        nets, ["date_actual", "player"]
    )
    assert cot.count() == 1868  # 467 dates x 4 players
    got = {
        r["date_actual"]: (r["cit_long"], r["cit_short"], r["cit_net"])
        for r in bi.cot_totals_by_date(cot).collect()
    }
    want_df = _read_ref_csv(
        spark,
        "CO_Net and Short by date_actual.csv",
        "date_actual timestamp, cit_long double, cit_net double, cit_short double",
    )
    want = {
        r["date_actual"]: (r["cit_long"], r["cit_short"], r["cit_net"])
        for r in want_df.collect()
    }
    assert len(want) == 467
    assert got == want


# ------------------------------------------------ byte-stable goldens


def _stg_fixture(spark):
    """Deterministic barchart-shaped staging table: 300 days x contract
    months {2, 3}, prices a fixed arithmetic pattern."""
    rows = []
    d0 = dt.date(2020, 1, 1)
    for i in range(300):
        for mo in (2, 3):
            last = 100.0 + ((i * 7) % 40) * 0.25 + mo * 1.5
            rows.append(((d0 + dt.timedelta(days=i)).isoformat(), mo, last))
    return spark.createDataFrame(
        rows, "date_actual string, mo int, last double"
    ).select(F.to_date("date_actual").alias("date_actual"), "mo", "last")


def golden_ma_lines(spark) -> list[str]:
    out = bi.ma_series(_stg_fixture(spark)).collect()
    lines = ["mo,date_actual,price,ma_200,ma_50"]
    for r in sorted(out, key=lambda r: (r["mo"], r["date_actual"])):
        lines.append(
            f"{r['mo']},{r['date_actual'].isoformat()},"
            f"{r['price']!r},{r['ma_200']!r},{r['ma_50']!r}"
        )
    return lines


def golden_spread_lines(spark) -> list[str]:
    out = bi.price_spread_by_date(_stg_fixture(spark)).collect()
    lines = ["date_actual,spread_max_min,n_contracts"]
    for r in sorted(out, key=lambda r: r["date_actual"]):
        lines.append(
            f"{r['date_actual'].isoformat()},{r['spread_max_min']!r},"
            f"{r['n_contracts']}"
        )
    return lines


def test_ma_series_golden_bytes(spark):
    with open(os.path.join(DATA, "golden_ma50_ma200.csv")) as f:
        want = f.read().splitlines()
    assert golden_ma_lines(spark) == want


def test_spread_golden_bytes(spark):
    with open(os.path.join(DATA, "golden_spread.csv")) as f:
        want = f.read().splitlines()
    assert golden_spread_lines(spark) == want
