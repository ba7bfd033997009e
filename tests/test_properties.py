"""Property-based checks (hypothesis): the algebraic guarantees the
engine's semantics rest on, probed with random inputs.

Each example spins Spark jobs, so example counts stay small — these
probe shapes of data the deterministic fixtures don't."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators.joins import merge_upsert
from building_coffee_commodity_trading_data_warehouse_spark.operators.windows import (
    with_trailing_means,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-1000, 1000)),
    min_size=0,
    max_size=12,
)


@_settings
@given(target=_rows, staged=_rows)
def test_merge_upsert_is_dict_update(spark, target, staged):
    """merge_upsert == dict.update on the natural key: staged rows win
    on collision, unmatched target rows survive, and re-applying the
    same snapshot changes nothing."""
    # unique keys per frame (the natural-key contract)
    t = {k: v for k, v in target}
    s = {k: v for k, v in staged}
    schema = "k int, v int"
    tdf = spark.createDataFrame(list(t.items()) or [], schema)
    sdf = spark.createDataFrame(list(s.items()) or [], schema)

    merged = merge_upsert(tdf, sdf, ["k"])
    got = {r["k"]: r["v"] for r in merged.collect()}
    want = {**t, **s}
    assert got == want

    again = merge_upsert(merged, sdf, ["k"])
    assert {r["k"]: r["v"] for r in again.collect()} == want


@_settings
@given(
    prices=st.lists(st.integers(1, 10**6), min_size=1, max_size=40),
    frame=st.sampled_from([1, 3, 7]),
)
def test_trailing_mean_matches_python(spark, prices, frame):
    """with_trailing_means == a plain python trailing mean, for any
    series and frame size (prefix-sum rewrite is semantics-preserving)."""
    rows = [
        (dt.date(2020, 1, 1) + dt.timedelta(days=i), float(p) / 100)
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, "d date, price double")
    w = Window.partitionBy(F.lit(1)).orderBy("d")
    out = with_trailing_means(df, "price", w, (frame,))
    got = [r[f"ma_{frame}"] for r in out.orderBy("d").collect()]
    vals = [float(p) / 100 for p in prices]
    for i, g in enumerate(got):
        lo = max(0, i - frame)
        want = sum(vals[lo : i + 1]) / (i + 1 - lo)
        assert abs(g - want) < 1e-9
