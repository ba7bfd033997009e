"""End-to-end domain pipeline on the KC=F.csv shape (E1 → BI):
sentinel-null CSV scan → idempotent merge load with audit → MA50/MA200
analytics — the full path a reference user runs, on Spark."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.plans import bi, ingest
from building_coffee_commodity_trading_data_warehouse_spark.sources import csv as csvsrc


def _write_ohlcv_csv(path, days=120, holidays=(16, 47, 80)):
    lines = ["Date,Open,High,Low,Close,Adj Close,Volume"]
    d0 = dt.date(2020, 1, 1)
    px = []
    for i in range(days):
        day = (d0 + dt.timedelta(days=i)).isoformat()
        if i in holidays:
            lines.append(f"{day},null,null,null,null,null,null")
            px.append(None)
        else:
            close = 100.0 + (i % 37) * 0.25
            lines.append(
                f"{day},{close - 1:.6f},{close + 2:.6f},{close - 2:.6f},"
                f"{close:.6f},{close:.6f},{1000 + i}"
            )
            px.append(close)
    path.write_text("\n".join(lines) + "\n")
    return px


def test_ohlcv_pipeline_end_to_end(spark, tmp_path):
    csv_path = tmp_path / "KC=F.csv"
    px = _write_ohlcv_csv(csv_path)
    target = str(tmp_path / "stg_ohlcv")
    audit = str(tmp_path / "audit")

    # E1: scan (sentinel nulls), merge on the natural key, audit
    raw = csvsrc.read_ohlcv(spark, str(csv_path))
    assert csvsrc.source_row_count(spark, str(csv_path)) == 120
    rep = ingest.load_with_audit(
        spark, raw, target, ["Date"], "stg", "KC=F.csv", "stg_ohlcv", "2020-05-01"
    )
    ingest.audit_append(spark, rep, audit)
    assert rep.source_row == rep.target_row == 120

    # rerun: idempotent (the reference's rerun guarantee)
    rep2 = ingest.load_with_audit(
        spark, raw, target, ["Date"], "stg", "KC=F.csv", "stg_ohlcv", "2020-05-02"
    )
    ingest.audit_append(spark, rep2, audit)
    assert rep2.target_row == 120
    assert spark.read.parquet(audit).count() == 2

    stg = spark.read.parquet(target)
    # holiday sentinel rows arrived as real NULLs
    assert stg.filter(F.col("Close").isNull()).count() == 3

    # BI: MA series over the loaded staging table (null closes drop out
    # of the series, as the reference's numeric casts do)
    prices = (
        stg.filter(F.col("Close").isNotNull())
        .select(
            F.lit(1).alias("mo"),
            F.col("Date").alias("date_actual"),
            F.col("Close").alias("last"),
        )
    )
    out = sorted(bi.ma_series(prices).collect(), key=lambda r: r["date_actual"])
    series = [p for p in px if p is not None]
    assert len(out) == len(series)
    # spot-check MA50 against a plain python trailing mean
    for i in (0, 10, 60, len(series) - 1):
        lo = max(0, i - 50)
        want = sum(series[lo : i + 1]) / (i + 1 - lo)
        assert abs(out[i]["ma_50"] - want) < 1e-9, i


def test_atr_known_bars(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.plans import bi

    bars = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00", 12.0, 8.0, 10.0),
            (1, "2024-01-01 10:00", 11.0, 10.5, 10.5),  # gap vs pc=10
            (1, "2024-01-01 11:00", 20.0, 15.0, 18.0),  # jump vs pc=10.5
        ],
        "user_id long, bar_hour string, high double, low double, close double",
    )
    out = {
        r["bar_hour"]: r for r in bi.atr_from_bars(bars, periods=2).collect()
    }
    # TRs: bar1 = 12-8 = 4; bar2 = max(0.5, |11-10|, |10.5-10|) = 1;
    # bar3 = max(5, |20-10.5|, |15-10.5|) = 9.5
    assert out["2024-01-01 09:00"]["true_range"] == 4.0
    assert out["2024-01-01 10:00"]["true_range"] == 1.0
    assert out["2024-01-01 11:00"]["true_range"] == 9.5
    assert out["2024-01-01 10:00"]["atr"] == 2.5   # (4+1)/2
    assert out["2024-01-01 11:00"]["atr"] == 5.25  # (1+9.5)/2
