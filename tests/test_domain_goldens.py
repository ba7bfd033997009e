"""Golden-output invariants from the reference's Data Processed/ CSVs
(SURVEY.md §5.2), reproduced on deterministic domain fixtures:

  * CIT_Net = CIT_Long + CIT_Short, per player and summed per date
    (CO_Net and Short by date_actual.csv × per-player files;
    2012-01-03: 102521 − 102521 = 0)
  * Spread_max_min(date) = price(far mo) − price(near mo)
    (Spead.csv × NY prices.csv; 2020-01-02: 131.45 − 129.40 = 2.05)
  * MA50/MA200 prefix-mean property on an arithmetic series
    (MA50 MA200.csv semantics, ODS.py:66-67)
"""

from __future__ import annotations

import datetime as dt

from building_coffee_commodity_trading_data_warehouse_spark.plans import bi

PLAYERS = ("Com", "Ncom", "Index", "Nrep")


def _cot(spark, weeks=60):
    rows = []
    d0 = dt.date(2012, 1, 3)
    for w in range(weeks):
        day = d0 + dt.timedelta(weeks=w)
        for i, p in enumerate(PLAYERS):
            long_ = 1000 * (i + 1) + w * 7
            short = -(800 * (i + 1) + w * 5)
            rows.append((day, p, float(long_), float(short), float(long_ + short)))
    return spark.createDataFrame(
        rows,
        "date_actual date, player string, cit_long double, cit_short double, cit_net double",
    )


def test_cot_net_identity_per_player(spark):
    out = bi.cot_by_player(_cot(spark)).collect()
    for r in out:
        assert r["cit_long"] >= 0 and r["cit_short"] <= 0
        assert r["cit_net"] == r["cit_long"] + r["cit_short"]


def test_cot_totals_sum_over_players(spark):
    cot = _cot(spark)
    totals = {r["date_actual"]: r for r in bi.cot_totals_by_date(cot).collect()}
    per_player = bi.cot_by_player(cot).collect()
    agg: dict = {}
    for r in per_player:
        a = agg.setdefault(r["date_actual"], [0.0, 0.0, 0.0])
        a[0] += r["cit_long"]
        a[1] += r["cit_short"]
        a[2] += r["cit_net"]
    assert set(totals) == set(agg)
    for d, (lo, sh, ne) in agg.items():
        t = totals[d]
        assert (t["cit_long"], t["cit_short"], t["cit_net"]) == (lo, sh, ne)
        assert t["cit_net"] == t["cit_long"] + t["cit_short"]  # golden identity


def test_spread_golden_value(spark):
    # the verified golden data point: 2020-01-02, mo 2 -> 129.40, mo 3 -> 131.45
    prices = spark.createDataFrame(
        [
            (dt.date(2020, 1, 2), 2, 129.40),
            (dt.date(2020, 1, 2), 3, 131.45),
            (dt.date(2020, 1, 3), 2, 130.00),
            (dt.date(2020, 1, 3), 3, 131.00),
        ],
        "date_actual date, mo int, last double",
    )
    out = {r["date_actual"]: r for r in bi.price_spread_by_date(prices).collect()}
    assert abs(out[dt.date(2020, 1, 2)]["spread_max_min"] - 2.05) < 1e-9
    assert abs(out[dt.date(2020, 1, 3)]["spread_max_min"] - 1.00) < 1e-9
    assert out[dt.date(2020, 1, 2)]["n_contracts"] == 2


def test_ma_prefix_mean_property(spark):
    # arithmetic series price_i = 100 + 2*i: trailing mean over a full
    # m-row frame is price_i - (m-1); during warmup it's the prefix mean
    rows = [
        (dt.date(2020, 1, 1) + dt.timedelta(days=i), 2, 100.0 + 2 * i)
        for i in range(300)
    ]
    prices = spark.createDataFrame(rows, "date_actual date, mo int, last double")
    out = sorted(bi.ma_series(prices).collect(), key=lambda r: r["date_actual"])
    for i, r in enumerate(out):
        m50 = min(i + 1, 51)  # 50 PRECEDING + CURRENT
        m200 = min(i + 1, 201)
        want50 = 100.0 + 2 * i - (m50 - 1)
        want200 = 100.0 + 2 * i - (m200 - 1)
        assert abs(r["ma_50"] - want50) < 1e-9, (i, r["ma_50"], want50)
        assert abs(r["ma_200"] - want200) < 1e-9, (i, r["ma_200"], want200)
