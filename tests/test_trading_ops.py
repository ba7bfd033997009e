"""Planted-value tests for the trading analytics II operators:
OHLCV tick→bar resample, rolling realized volatility, and the
temperature sampling mix (each also oracle-gated in __spark_entry__)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators import curate, windows
from building_coffee_commodity_trading_data_warehouse_spark.plans import bi


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _t(h, m, s):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_ohlcv_bars_planted(spark):
    ev = _events(
        spark,
        [
            # user 7, hour 09: open 10 (earliest), close 30 (latest),
            # high 40, low 5
            (1, _t(9, 0, 1), 7, 10.0),
            (2, _t(9, 15, 0), 7, 40.0),
            (3, _t(9, 30, 0), 7, 5.0),
            (4, _t(9, 59, 59), 7, 30.0),
            # user 7, hour 10: single tick — open=close=high=low
            (5, _t(10, 5, 0), 7, 12.5),
        ],
    )
    out = {
        (r["user_id"], r["bar_hour"]): r for r in bi.ohlcv_bars(ev).collect()
    }
    bar = out[(7, "2024-01-01 09:00")]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (10.0, 40.0, 5.0, 30.0)
    assert bar["volume"] == 85.0 and bar["n_ticks"] == 4
    single = out[(7, "2024-01-01 10:00")]
    assert (
        single["open"] == single["close"] == single["high"] == single["low"] == 12.5
    )


def test_ohlcv_tie_breaks_on_event_id(spark):
    # two ticks at the SAME timestamp: lower event_id is the open,
    # higher is the close — the composite epoch||id key decides.
    ev = _events(
        spark,
        [(10, _t(9, 0, 0), 1, 111.0), (11, _t(9, 0, 0), 1, 222.0)],
    )
    bar = bi.ohlcv_bars(ev).collect()[0]
    assert bar["open"] == 111.0 and bar["close"] == 222.0


def test_rolling_volatility_constant_and_known(spark):
    ev = _events(
        spark,
        [
            # constant series -> vol 0 at every step
            (1, _t(9, 0, 1), 1, 4.0),
            (2, _t(9, 0, 2), 1, 4.0),
            (3, _t(9, 0, 3), 1, 4.0),
            # user 2: [3, 7] -> mean 5, var ((9+49)/2 - 25) = 4, vol 2
            (4, _t(9, 0, 1), 2, 3.0),
            (5, _t(9, 0, 2), 2, 7.0),
        ],
    )
    out = {r["event_id"]: r for r in windows.rolling_volatility(ev).collect()}
    assert all(out[i]["roll_vol"] == 0.0 for i in (1, 2, 3))
    assert out[5]["n_obs"] == 2
    assert out[5]["roll_mean"] == 5.0
    assert out[5]["roll_vol"] == 2.0


def test_temperature_mix_flattens_toward_tail(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 90 else "vi") for i in range(100)],
        "doc_id long, lang string",
    )
    out = {r["stratum"]: r for r in curate.temperature_mix(docs).collect()}
    assert out["en"]["n_docs"] == 90 and out["vi"]["n_docs"] == 10
    w_en, w_vi = out["en"]["sample_weight"], out["vi"]["sample_weight"]
    assert abs(w_en + w_vi - 1.0) < 1e-12
    # sqrt flattening: tail share rises above raw frequency (0.10),
    # head drops below 0.90, ordering preserved
    assert 0.10 < w_vi < w_en < 0.90
    assert math.isclose(w_vi / w_en, math.sqrt(10.0 / 90.0), rel_tol=1e-12)
    assert math.isclose(
        out["en"]["expected_docs"] + out["vi"]["expected_docs"], 100.0, rel_tol=1e-12
    )


def test_ewma_planted_values(spark):
    ev = _events(
        spark,
        [
            (1, _t(9, 0, 1), 1, 4.0),
            (2, _t(9, 0, 2), 1, 8.0),
            (3, _t(9, 0, 3), 1, 2.0),
        ],
    )
    out = {r["event_id"]: r for r in windows.ewma(ev).collect()}
    assert out[1]["ewma"] == 4.0                      # single tick
    assert out[2]["ewma"] == 8.0 + 4.0 / 2            # newest full weight
    assert out[3]["ewma"] == 2.0 + 8.0 / 2 + 4.0 / 4
    assert out[3]["n_terms"] == 3


def test_drawdown_planted_path(spark):
    ev = _events(
        spark,
        [
            (1, _t(9, 0, 1), 1, 10.0),
            (2, _t(9, 0, 2), 1, 7.0),   # below peak 10
            (3, _t(9, 0, 3), 1, 12.0),  # new peak
            (4, _t(9, 0, 4), 1, 9.0),   # 3 below peak 12
        ],
    )
    out = {r["event_id"]: r for r in windows.drawdown(ev).collect()}
    assert [out[i]["peak"] for i in (1, 2, 3, 4)] == [10.0, 10.0, 12.0, 12.0]
    assert [out[i]["drawdown"] for i in (1, 2, 3, 4)] == [0.0, 3.0, 0.0, 3.0]


def test_pareto_smallest_covering_prefix(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    orders = spark.createDataFrame(
        # revenue per customer: 50, 30, 15, 5 -> 80% of 100 is covered
        # by {1, 2} (80); customer 3 tips past, 4 never needed
        [(1, 1, 50.0), (2, 2, 30.0), (3, 3, 15.0), (4, 4, 5.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    out = sorted(
        analytics.pareto_customers(orders).collect(), key=lambda r: r["o_custkey"]
    )
    assert [r["o_custkey"] for r in out] == [1, 2]
    assert out[-1]["cum_revenue"] == 80.0
    assert out[-1]["cum_share"] == 0.8


def test_zscore_outliers_planted_spike(spark):
    """A flat series never alarms (0 > 0 is false, no epsilon games);
    a single spike alarms exactly once, at the spike. The spike sits
    deep enough in its window that z=3 is reachable — a point inside
    its own sample caps at z = (n−1)/√n, so n must be ≥ 11."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, base + dt.timedelta(minutes=i), 10.0 if i != 14 else 99.0)
        for i in range(15)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r["event_id"]: r["is_outlier"] for r in windows.zscore_outliers(df).collect()}
    assert out[14] is True
    assert all(v is False for k, v in out.items() if k != 14)


def test_zscore_outliers_single_user_exchange(spark):
    """One hash exchange on user_id — the frame rides the sorted run."""
    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    from building_coffee_commodity_trading_data_warehouse_spark.plans.explain import shuffle_count

    assert shuffle_count(windows.zscore_outliers(df)) == 1


def test_resample_ffill_planted_gap(spark):
    """Ticks on day 1 (two — last wins) and day 4: the grid has all 4
    days, silent days carry day-1's close, observed flags are exact."""
    rows = [
        (1, dt.datetime(2024, 3, 1, 9, 0), 7, 10.0),
        (2, dt.datetime(2024, 3, 1, 16, 0), 7, 12.0),  # later tick wins day 1
        (3, dt.datetime(2024, 3, 4, 9, 0), 7, 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from building_coffee_commodity_trading_data_warehouse_spark.plans import bi

    out = {r["day_s"]: r for r in bi.resample_daily_ffill(df).collect()}
    assert sorted(out) == ["2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"]
    assert out["2024-03-01"]["close_ffill"] == 12.0
    assert out["2024-03-02"]["close_ffill"] == 12.0 and not out["2024-03-02"]["observed"]
    assert out["2024-03-03"]["close_ffill"] == 12.0 and not out["2024-03-03"]["observed"]
    assert out["2024-03-04"]["close_ffill"] == 20.0 and out["2024-03-04"]["observed"]


def test_resample_ffill_single_tick_scan(spark):
    """The tick-collapsing aggregate materializes once (scoped persist)
    — every downstream consumer reads the cached day frame, not the
    raw tick stream."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1), 7, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    from building_coffee_commodity_trading_data_warehouse_spark.plans import bi
    from building_coffee_commodity_trading_data_warehouse_spark.plans.explain import plan_string

    assert plan_string(bi.resample_daily_ffill(df)).count("InMemoryTableScan") >= 2


def test_waiting_suppliers_planted_blame(spark):
    """Q21 decorrelation semantics on a hand-built scenario: blame
    requires (a) order status 'F', (b) >1 distinct supplier on the
    order, (c) EXACTLY one of them late."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.plans.analytics import (
        waiting_suppliers,
    )

    d0 = dt.datetime(1996, 1, 1)
    late = d0 + dt.timedelta(days=90)
    ontime = d0 + dt.timedelta(days=10)
    li = spark.createDataFrame(
        [
            # order 1: two suppliers, only supp 7 late -> blame 7
            (1, 7, late), (1, 8, ontime),
            # order 2: two suppliers, both late -> no blame
            (2, 7, late), (2, 8, late),
            # order 3: single supplier late -> no blame (not multi)
            (3, 7, late),
            # order 4 (status 'O'): would blame 9, but not finished
            (4, 9, late), (4, 8, ontime),
            # order 5: two suppliers, supp 9 late -> blame 9
            (5, 9, late), (5, 7, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    od = spark.createDataFrame(
        [(1, "F", d0), (2, "F", d0), (3, "F", d0), (4, "O", d0), (5, "F", d0)],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    supp = spark.createDataFrame(
        [(7, "S7"), (8, "S8"), (9, "S9")], "s_suppkey long, s_name string"
    )
    got = {
        (r["s_suppkey"], r["numwait"])
        for r in waiting_suppliers(li, od, supp).collect()
    }
    assert got == {(7, 1), (9, 1)}


def test_min_cost_supplier_planted_argmin(spark):
    """Q2 decorrelation: per part, the REGIONAL supplier with the
    minimum observed unit price wins; ties break on suppkey; parts
    above the size cap and out-of-region suppliers are excluded."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.plans.analytics import (
        min_cost_supplier,
    )

    _ = dt
    li = spark.createDataFrame(
        [
            # part 1: supp 1 sells at 2.0/unit, supp 2 at 1.0/unit
            (100, 1, 1, 10.0, 20.0),
            (100, 1, 2, 10.0, 10.0),
            # part 2: only out-of-region supp 3 sells it -> excluded
            (101, 2, 3, 5.0, 25.0),
            # part 3 (size too big): cheapest is irrelevant
            (102, 3, 1, 2.0, 2.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#1", 5), (2, "Brand#2", 5), (3, "Brand#3", 40)],
        "p_partkey long, p_brand string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 100.0, 10), (2, "S2", 50.0, 10), (3, "S3", 999.0, 20)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey int",
    )
    nation = spark.createDataFrame(
        [(10, "N_IN", 1), (20, "N_OUT", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(1, "ASIA"), (2, "AMERICA")], "r_regionkey int, r_name string"
    )
    rows = min_cost_supplier(
        li, part, supplier, nation, region, region_name="ASIA", max_size=15
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["p_partkey"], r["s_name"], r["unit_cost"]) == (1, "S2", 1.0)


def test_rolling_correlation_extremes(spark):
    """Perfectly linear series → corr ≈ ±1 (within the 2^-16 lattice
    tolerance); warm-up row with one observation → NULL."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
        rolling_correlation,
    )

    d0 = dt.datetime(1996, 1, 1)
    rows = []
    for i in range(10):
        # part 1: y = 3x (positive), part 2: y = 100 - 2x (negative)
        rows.append((i, 1, 1, float(i + 1), 3.0 * (i + 1), d0 + dt.timedelta(days=i)))
        rows.append((i, 1, 2, float(i + 1), 100.0 - 2.0 * (i + 1), d0 + dt.timedelta(days=i)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = rolling_correlation(df, 5).collect()
    by = {(r["l_partkey"], r["l_orderkey"]): r["roll_corr"] for r in got}
    assert by[(1, 0)] is None  # single observation: zero variance
    assert abs(by[(1, 9)] - 1.0) < 1e-3
    assert abs(by[(2, 9)] + 1.0) < 1e-3


def test_rsi_monotone_series(spark):
    """Strictly rising prices → RSI 100 after warm-up; strictly
    falling → RSI 0; warm-up rows → NULL."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
        rsi,
    )

    d0 = dt.datetime(1996, 1, 1)
    rows = []
    for i in range(20):
        rows.append((i, 1, 1, 100.0 + i, d0 + dt.timedelta(days=i)))
        rows.append((i, 1, 2, 100.0 - i, d0 + dt.timedelta(days=i)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_extendedprice double, l_shipdate timestamp",
    )
    got = {(r["l_partkey"], r["l_orderkey"]): r["rsi"] for r in rsi(df, 14).collect()}
    assert got[(1, 5)] is None  # warm-up: fewer than 14 moves
    assert got[(1, 19)] == 100.0
    assert got[(2, 19)] == 0.0


def test_anchored_vwap_planted_values(spark):
    """Hand-computable VWAP: day-1 (price 10, qty 2) + (20, 2) →
    day_vwap 15; day-2 (30, 4) → day_vwap 30 and anchored
    (10·2+20·2+30·4)/(2+2+4) = 22.5."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
        anchored_vwap,
    )

    d1, d2 = dt.datetime(1996, 1, 1), dt.datetime(1996, 1, 2)
    df = spark.createDataFrame(
        [
            (1, 1, 1, 2.0, 10.0, d1),
            (2, 1, 1, 2.0, 20.0, d1),
            (3, 1, 1, 4.0, 30.0, d2),
        ],
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_quantity double, l_extendedprice double, l_shipdate timestamp",
    )
    got = {r["trade_date"]: r for r in anchored_vwap(df).collect()}
    assert got["1996-01-01"]["day_vwap"] == 15.0
    assert got["1996-01-01"]["anchored_vwap"] == 15.0
    assert got["1996-01-02"]["day_vwap"] == 30.0
    assert got["1996-01-02"]["anchored_vwap"] == 22.5


def test_bollinger_planted_values(spark):
    """Constant series → σ=0, bands collapse onto mid, %B NULL; a
    known 5-tick frame → textbook mid ± 2σ and in-band %B."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
        bollinger_bands,
    )

    d0 = dt.datetime(1996, 1, 1)
    rows = []
    for i in range(6):
        rows.append((i, 1, 1, 50.0, d0 + dt.timedelta(days=i)))  # flat
        rows.append(
            (i, 1, 2, [10.0, 20.0, 30.0, 40.0, 50.0, 60.0][i], d0 + dt.timedelta(days=i))
        )
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_extendedprice double, l_shipdate timestamp",
    )
    got = bollinger_bands(df, window_rows=5, k=2).collect()
    by = {(r["l_partkey"], r["l_orderkey"]): r for r in got}
    flat = by[(1, 5)]
    assert flat["mid"] == 50.0 and flat["upper"] == 50.0 and flat["lower"] == 50.0
    assert flat["pct_b"] is None
    r = by[(2, 5)]  # frame 20..60: mean 40, pop σ = sqrt(200)
    assert abs(r["mid"] - 40.0) < 1e-4
    sd = math.sqrt(200.0)
    assert abs(r["upper"] - (40.0 + 2 * sd)) < 1e-3
    assert abs(r["lower"] - (40.0 - 2 * sd)) < 1e-3
    # price 60 sits at (60-lower)/(upper-lower)
    assert abs(r["pct_b"] - (60.0 - r["lower"]) / (r["upper"] - r["lower"])) < 1e-12


def test_date_dim_calendar_edges(spark):
    """Leap day present, ISO week/dow renumbering correct at year
    boundaries, smart-key join-ready, empty range raises."""
    import pytest as _pytest

    from building_coffee_commodity_trading_data_warehouse_spark.plans.ods import date_dim

    dim = date_dim(spark, "1995-12-30", "1996-03-02").collect()
    by = {r["date_actual"].isoformat(): r for r in dim}
    assert len(dim) == 64  # 2 (Dec) + 31 + 29 + 2 — 1996 is a leap year
    assert "1996-02-29" in by
    jan1 = by["1996-01-01"]  # a Monday: ISO week 1, dow 1
    assert (jan1["iso_dow"], jan1["iso_week"], jan1["day_name"]) == (1, 1, "Monday")
    dec31 = by["1995-12-31"]  # a Sunday: ISO dow 7, week 52 of 1995
    assert (dec31["iso_dow"], dec31["iso_week"], dec31["is_weekend"]) == (7, 52, True)
    assert jan1["date_id"] == 19960101 and jan1["epoch_day"] == 9496
    assert by["1996-02-29"]["last_day_of_month"].isoformat() == "1996-02-29"
    with _pytest.raises(ValueError):
        date_dim(spark, "1996-01-02", "1996-01-01")


def test_rolling_quartiles_known_frames(spark):
    import datetime as _dt

    rows = [
        # one part, quantities 10,20,90,40 in ship order
        (1, 1, 7, _dt.date(1995, 1, 1), 10.0),
        (2, 1, 7, _dt.date(1995, 1, 2), 20.0),
        (3, 1, 7, _dt.date(1995, 1, 3), 90.0),
        (4, 1, 7, _dt.date(1995, 1, 4), 40.0),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_shipdate date, l_quantity double",
    )
    out = {
        r["l_orderkey"]: r
        for r in windows.rolling_quartiles(li, window_rows=4).collect()
    }
    assert out[1]["median"] == 10.0 and out[1]["n_obs"] == 1
    assert out[2]["median"] == 15.0  # {10,20}
    assert out[3]["median"] == 20.0  # {10,20,90}
    assert out[4]["median"] == 30.0  # {10,20,40,90} -> (20+40)/2
    # quartiles of {10,20,40,90}: q25 at rank 0.75 -> 17.5, q75 -> 52.5
    assert out[4]["q25"] == 17.5 and out[4]["q75"] == 52.5
    assert out[4]["iqr"] == 35.0


def test_holt_smoothing_matches_python_reference(spark):
    import datetime as _dt

    ys = [10.0, 14.0, 9.0, 20.0, 18.0, 25.0]
    rows = [
        (i + 1, _dt.datetime(2024, 1, 1, 0, i), 1, "t", y, "{}")
        for i, y in enumerate(ys)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["seq"]: r for r in windows.holt_smoothing(ev).collect()
    }
    lvl, tr = ys[0], 0.0
    for i, y in enumerate(ys):
        if i > 0:
            new = 0.5 * y + 0.5 * (lvl + tr)
            tr = 0.25 * (new - lvl) + 0.75 * tr
            lvl = new
        r = got[i + 1]
        assert r["level"] == lvl and r["trend"] == tr
        assert r["forecast"] == lvl + tr


def test_holt_smoothing_partition_invariant(spark):
    import datetime as _dt

    rows = [
        (u * 100 + i, _dt.datetime(2024, 1, 1, u, i), u, "t", float(i * u + 1), "{}")
        for u in range(1, 6)
        for i in range(30)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    a = sorted(map(tuple, windows.holt_smoothing(ev.coalesce(1)).collect()))
    b = sorted(map(tuple, windows.holt_smoothing(ev.repartition(16)).collect()))
    assert a == b


def test_cusum_matches_recursive_definition(spark):
    import datetime as _dt

    # calm series then a level shift: the rewrite P_t - min(P) must
    # equal the textbook recursion s_t = max(0, s_{t-1} + (x_t - mu))
    ys = [10.0, 10.0, 10.0, 10.0, 30.0, 30.0, 30.0, 30.0]
    rows = [
        (i + 1, _dt.datetime(2024, 1, 1, 0, i), 1, "t", y, "{}")
        for i, y in enumerate(ys)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["event_id"]: r
        for r in windows.cusum_changepoints(ev, h_units=5).collect()
    }
    mu = sum(ys) / len(ys)  # 20.0, exact in double
    s = 0.0
    for i, y in enumerate(ys):
        s = max(0.0, s + (y - mu))
        got = out[i + 1]
        assert got["cusum_stat"] == s, (i, got["cusum_stat"], s)
    # the shifted tail must alarm at h=5 (s reaches 40), the calm head not
    assert out[1]["is_alarm"] is False
    assert out[8]["is_alarm"] is True


def test_interpolate_linear_time_weighted(spark):
    import datetime as _dt

    # event_id 5 and 10 are masked (id % 5 == 0); 5 sits 1/4 of the
    # way between its neighbors in TIME, so the fill is time-weighted
    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (4, t0, 1, "t", 10.0, "{}"),
        (5, t0 + _dt.timedelta(seconds=10), 1, "t", 999.0, "{}"),  # masked
        (6, t0 + _dt.timedelta(seconds=40), 1, "t", 50.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in windows.interpolate_linear(ev).collect()}
    assert out[5]["was_masked"] == 1
    assert out[5]["filled_value"] == 10.0 + (50.0 - 10.0) * 0.25
    assert out[4]["filled_value"] == 10.0 and out[4]["was_masked"] == 0


def test_interpolate_linear_edges_degrade(spark):
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        (5, t0, 1, "t", 1.0, "{}"),               # masked, leading edge
        (6, t0 + _dt.timedelta(minutes=1), 1, "t", 7.0, "{}"),
        (10, t0 + _dt.timedelta(minutes=2), 1, "t", 2.0, "{}"),  # masked tail
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in windows.interpolate_linear(ev).collect()}
    assert out[5]["filled_value"] == 7.0   # no prev -> next
    assert out[10]["filled_value"] == 7.0  # no next -> prev


def test_forecast_intervals_known_residuals(spark):
    import datetime as _dt

    ys = [10.0, 10.0, 10.0, 22.0, 10.0]
    rows = [
        (i + 1, _dt.datetime(2024, 1, 1, 0, i), 1, "t", y, "{}")
        for i, y in enumerate(ys)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = windows.forecast_intervals(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_resid"] == 4  # last event has no realized next value
    # replay: forecasts from the holt fold, residual = next - forecast
    lvl, tr = ys[0], 0.0
    resids = []
    for i, y in enumerate(ys):
        if i > 0:
            resids.append(y - (lvl + tr))
            new = 0.5 * y + 0.5 * (lvl + tr)
            tr = 0.25 * (new - lvl) + 0.75 * tr
            lvl = new
    import math

    lat = [math.floor(x * 65536.0) for x in sorted(resids)]
    med = (lat[1] + lat[2]) / 2 / 65536.0
    assert r["median_resid"] == med


def test_on_balance_volume_textbook(spark):
    import datetime as _dt

    # prices 10,12,11,11,15 with qty 1,2,3,4,5 ->
    # OBV: 0, +2, -1, -1 (flat), +4
    rows = [
        (i + 1, 1, 7, _dt.date(1995, 1, 1 + i), float(p), float(q))
        for i, (p, q) in enumerate(
            [(10, 1), (12, 2), (11, 3), (11, 4), (15, 5)]
        )
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_shipdate date, l_extendedprice double, l_quantity double",
    )
    out = {
        r["l_orderkey"]: r["obv"]
        for r in windows.on_balance_volume(li).collect()
    }
    assert out == {1: 0.0, 2: 2.0, 3: -1.0, 4: -1.0, 5: 4.0}


def test_stochastic_known_frames(spark):
    import datetime as _dt

    rows = [
        (i + 1, 1, 7, _dt.date(1995, 1, 1 + i), p)
        for i, p in enumerate([10.0, 20.0, 15.0, 10.0])
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_shipdate date, l_extendedprice double",
    )
    out = {
        r["l_orderkey"]: r
        for r in windows.stochastic_oscillator(li, periods=3).collect()
    }
    assert out[1]["pct_k"] is None           # flat 1-row window
    assert out[2]["pct_k"] == 1.0            # at the high of {10,20}
    assert out[3]["pct_k"] == 0.5            # mid of {10,20,15}
    assert out[4]["pct_k"] == 0.0            # at the low of {20,15,10}
    assert out[4]["low_n"] == 10.0 and out[4]["high_n"] == 20.0


def test_pivot_points_known_levels(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.plans import bi
    import datetime as dt

    # day 1: H=110 L=90 C=100 -> day 2 pivot=100, r1=110, s1=90,
    # r2=120, s2=80; day 1 itself has no prior bar -> NULL rails
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "tick", 90.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 10), 1, "tick", 110.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 11), 1, "tick", 100.0, "{}"),
        (4, dt.datetime(2024, 1, 2, 9), 1, "tick", 105.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["day"]: r for r in bi.pivot_points_daily(ev).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert d1["pivot"] is None and d1["r1"] is None
    assert (d1["high"], d1["low"], d1["close"]) == (110.0, 90.0, 100.0)
    assert d2["pivot"] == 100.0
    assert (d2["r1"], d2["s1"]) == (110.0, 90.0)
    assert (d2["r2"], d2["s2"]) == (120.0, 80.0)
