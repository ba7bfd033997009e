"""Edge semantics of the as-of join and binned range join
(operators/asof.py): tie-breaking, equal-timestamp inclusion,
boundary inclusivity, overlapping intervals, bin-width invariance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators import asof

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec):
    return _T0 + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(10)),  # after q@5 and q@10 -> equal-ts quote wins
            (2, "A", _ts(4)),   # before any quote -> NULL
            (3, "A", _ts(30)),  # after the tie pair at ts=20
            (4, "B", _ts(10)),  # other key: only B quotes visible
        ],
        "trade_id long, key string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (100, "A", _ts(5), 1.0),
            (101, "A", _ts(10), 2.0),   # exactly simultaneous with trade 1
            (102, "A", _ts(20), 3.0),   # tie on ts with 103
            (103, "A", _ts(20), 4.0),   # higher tiebreak id -> wins
            (104, "B", _ts(1), 9.0),
        ],
        "qid long, key string, ts timestamp, px double",
    )
    out = asof.asof_join(
        trades, quotes, on=["key"], left_ts="ts", right_ts="ts",
        value_cols=["px"], tiebreak="qid",
    )
    got = {r["trade_id"]: r["px_asof"] for r in out.collect()}
    assert got == {1: 2.0, 2: None, 3: 4.0, 4: 9.0}
    # matched quote timestamp comes back too
    ts_got = {r["trade_id"]: r["ts_asof"] for r in out.collect()}
    assert ts_got[1] == _ts(10) and ts_got[2] is None and ts_got[3] == _ts(20)


def test_asof_join_no_torn_rows(spark):
    """All matched columns must come from the SAME right row: when the
    newest matching quote has NULL in one value column, that NULL
    surfaces (LATERAL top-1 semantics) instead of back-filling the
    column from an older quote."""
    trades = spark.createDataFrame(
        [(1, "A", _ts(30))], "trade_id long, key string, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [
            (100, "A", _ts(10), 1.0, 5.0),
            (101, "A", _ts(20), None, 7.0),  # newest: px NULL, sz 7.0
        ],
        "qid long, key string, ts timestamp, px double, sz double",
    )
    row = asof.asof_join(
        trades, quotes, on=["key"], left_ts="ts", right_ts="ts",
        value_cols=["px", "sz"], tiebreak="qid",
    ).collect()[0]
    assert row["px_asof"] is None          # NOT 1.0 from the older quote
    assert row["sz_asof"] == 7.0
    assert row["ts_asof"] == _ts(20)


def test_asof_join_bucketed_parity(spark):
    """Skew-bucketed variant returns byte-identical output to the plain
    formulation, including carries across empty buckets and NULL value
    columns."""
    import random

    rng = random.Random(7)
    trades = spark.createDataFrame(
        [
            (i, rng.choice(["A", "B"]), _ts(rng.randrange(0, 400)))
            for i in range(60)
        ],
        "trade_id long, key string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (
                100 + i,
                rng.choice(["A", "B", "C"]),
                _ts(rng.randrange(0, 400)),
                None if i % 7 == 0 else float(i),
            )
            for i in range(40)
        ],
        "qid long, key string, ts timestamp, px double",
    )
    kw = dict(on=["key"], left_ts="ts", right_ts="ts",
              value_cols=["px"], tiebreak="qid")
    plain = asof.asof_join(trades, quotes, **kw)
    # 60 s buckets over a 400 s span -> ~7 buckets, several empty per key
    bucketed = asof.asof_join_bucketed(trades, quotes, bucket_seconds=60, **kw)
    key = lambda r: r["trade_id"]
    assert sorted(plain.collect(), key=key) == sorted(bucketed.collect(), key=key)


def test_asof_join_single_shuffle(spark):
    trades = spark.createDataFrame([(1, "A", _ts(1))], "trade_id long, key string, ts timestamp")
    quotes = spark.createDataFrame([(9, "A", _ts(0), 1.0)], "qid long, key string, ts timestamp, px double")
    plan = (
        asof.asof_join(trades, quotes, ["key"], "ts", "ts", ["px"], "qid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash partitioning on the key serves the whole plan: no join
    # operator at all, a single window over the unioned sides
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_boundaries_and_overlap(spark):
    points = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 10.0), (4, 15.0), (5, 99.0)], "pid long, v double"
    )
    intervals = spark.createDataFrame(
        [(10, -10.0, 0.0), (11, 0.0, 10.0), (12, 5.0, 20.0)],
        "iid long, lo double, hi double",
    )
    out = asof.range_join_bins(points, intervals, "v", "lo", "hi", bin_width=7.0)
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {
        (1, 10),            # interior, negative values
        (2, 10), (2, 11),   # lo/hi boundaries are BOTH inclusive
        (3, 11), (3, 12),   # overlapping intervals -> two rows
        (4, 12),
    }                        # pid 5 matches nothing


def test_range_join_bin_width_invariance(spark):
    points = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 0.7 - 30).alias("v")
    )
    intervals = spark.range(12).select(
        F.col("id").alias("iid"),
        (F.col("id") * 9.0 - 40).alias("lo"),
        (F.col("id") * 9.0 - 40 + 13.0).alias("hi"),
    )
    expected = None
    for w in (1.0, 6.5, 13.0, 40.0):
        got = sorted(
            (r["pid"], r["iid"])
            for r in asof.range_join_bins(points, intervals, "v", "lo", "hi", w).collect()
        )
        if expected is None:
            expected = got
        assert got == expected and len(got) > 0


def test_asof_tolerance_rejects_stale_quotes(spark):
    import datetime as dt

    mk = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    trades = spark.createDataFrame(
        [(1, 7, mk("2024-01-01T12:00:00"))],
        "trade_id long, user_id long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [(10, 7, mk("2024-01-01T11:49:00"), 5.0),
         (11, 7, mk("2024-01-01T10:00:00"), 9.0)],
        "event_id long, user_id long, ts timestamp, quote double",
    )
    from building_coffee_commodity_trading_data_warehouse_spark.operators import asof

    # 11:49 quote is inside a 15-min bound; with a 5-min bound nothing is
    fresh = asof.asof_join(
        trades, quotes, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["quote"], tiebreak="event_id", tolerance_seconds=900,
    ).collect()[0]
    assert fresh["quote_asof"] == 5.0
    stale = asof.asof_join(
        trades, quotes, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["quote"], tiebreak="event_id", tolerance_seconds=300,
    ).collect()[0]
    assert stale["quote_asof"] is None and stale["ts_asof"] is None


def test_asof_directions_match_pandas_merge_asof(spark):
    """forward/nearest/backward pinned against pandas.merge_asof on
    randomized keyed tick data (tolerance included): the independent
    reference implementation for all three search directions, ties and
    exact-timestamp matches included."""
    import numpy as np
    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.operators import asof

    rng = np.random.default_rng(42)
    n_l, n_r = 120, 90
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_l),
            "lts": pd.to_datetime(
                rng.integers(0, 500, n_l) * 1_000_000_000 + 1_600_000_000_000_000_000
            ),
            "lid": np.arange(n_l),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_r),
            "rts": pd.to_datetime(
                rng.integers(0, 500, n_r) * 1_000_000_000 + 1_600_000_000_000_000_000
            ),
            "px": rng.integers(100, 200, n_r).astype("float64"),
        }
    )
    # merge_asof requires unique, sorted on-keys per direction; drop
    # duplicate (k, rts) so the expected match is well-defined
    right_pd = right_pd.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    ldf = spark.createDataFrame(left_pd, "k long, lts timestamp, lid long")
    rdf = spark.createDataFrame(right_pd, "k long, rts timestamp, px double")

    for direction, tol in [
        ("backward", None),
        ("forward", None),
        ("nearest", None),
        ("backward", 60.0),
        ("forward", 60.0),
        ("nearest", 60.0),
    ]:
        got = (
            asof.asof_join(
                ldf,
                rdf,
                on=["k"],
                left_ts="lts",
                right_ts="rts",
                value_cols=["px"],
                tolerance_seconds=tol,
                direction=direction,
            )
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left_pd.sort_values("lts"),
            right_pd.sort_values("rts"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values("lid").reset_index(drop=True)
        assert (
            got["px_asof"].fillna(-1).to_numpy()
            == exp["px"].fillna(-1).to_numpy()
        ).all(), f"direction={direction} tol={tol}"
