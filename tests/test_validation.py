"""Semantics of the Deequ-style constraint suite and the embedding
dimension-stats pre-pass (oracle parity for their gates is covered by
test_oracle_parity.py automatically)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.plans import maintenance
from building_coffee_commodity_trading_data_warehouse_spark.operators import similarity


def test_check_constraints_null_is_violation(spark):
    """A NULL predicate result counts as a violation — completeness
    rules cannot silently pass on missing data."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    out = {
        r["rule"]: r
        for r in maintenance.check_constraints(
            df, {"v_positive": F.col("v") > 0, "v_not_null": F.col("v").isNotNull()}
        ).collect()
    }
    assert out["v_positive"]["n_violations"] == 2  # NULL and -5.0
    assert out["v_not_null"]["n_violations"] == 1
    assert out["v_positive"]["n_rows"] == 3
    assert not out["v_positive"]["passed"]


def test_check_constraints_single_scan(spark):
    """Scale pin: N rules = ONE aggregate over one scan (no joins, no
    extra exchanges beyond the 1-row fold)."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans.explain import plan_string

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    plan = plan_string(
        maintenance.check_constraints(
            df, {"a": F.col("v") > 0, "b": F.col("v") < 10, "c": F.col("id") > 0}
        )
    )
    assert plan.count("Scan ") <= 1, plan


def test_check_unique_counts_surplus_rows(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k long"
    )
    row = maintenance.check_unique(df, ["k"]).collect()[0]
    assert row["n_rows"] == 5
    assert row["n_violations"] == 2  # two surplus copies of k=1
    assert not row["passed"]


def test_check_foreign_key_orphans_and_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 10)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = maintenance.check_foreign_key(child, "fk", parent, "pk").collect()[0]
    assert row["n_rows"] == 4
    assert row["n_violations"] == 1  # fk=99; NULL fk is not an orphan
    assert not row["passed"]


def test_dimension_stats_planted_values(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [3.0, 10.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["dim"]: r for r in similarity.dimension_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["mean_val"] == 2.0
    assert got[1]["std_val"] == 1.0  # values 1,3 -> var 1
    assert got[2]["std_val"] == 0.0  # constant dimension
    assert (got[1]["min_val"], got[1]["max_val"]) == (1.0, 3.0)
    assert got[1]["n_values"] == 2


def test_dimension_stats_shuffle_is_dim_keyed(spark):
    """Scale pin: the only hash exchange keys on the (tiny) dim column
    — partial aggregation folds (dim, partials) map-side."""
    import re

    from building_coffee_commodity_trading_data_warehouse_spark.plans.explain import plan_string

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = plan_string(similarity.dimension_stats(df))
    assert not re.search(r"Exchange hashpartitioning\(vec_id", plan), plan
    assert re.search(r"partial_count|partial", plan) or "HashAggregate" in plan


def test_active_users_planted_panel(spark):
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import aggregates

    rows = []
    # user 1 active Jan 1 and Jan 5; user 2 active Jan 1 only (twice).
    for i, (d, u) in enumerate(
        [(1, 1), (5, 1), (1, 2), (1, 2)], start=1
    ):
        rows.append((i, dt.datetime(2024, 1, d, 12, 0), u, "click", 1.0, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["day"]: r for r in aggregates.active_users(ev, window_days=7).collect()}
    assert (got["2024-01-01"]["dau"], got["2024-01-01"]["wau"]) == (2, 2)
    assert (got["2024-01-05"]["dau"], got["2024-01-05"]["wau"]) == (1, 2)
    # duplicate events never double-count; days past the last observed
    # day are not reported
    assert max(got) == "2024-01-05"
    # Jan 2-4: nobody active that day, both users in the trailing week
    assert (got["2024-01-03"]["dau"], got["2024-01-03"]["wau"]) == (0, 2)


def test_mad_stats_planted_values(spark):
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import aggregates

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "a", v, None)
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0], start=1)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = aggregates.mad_stats(ev).collect()[0]
    # median 3; |devs| = [2,1,0,1,97] -> median dev 1 (robust: the
    # outlier 100 moves MAD not at all where stddev explodes)
    assert r["median_val"] == 3.0
    assert r["mad"] == 1.0
    assert r["n_rows"] == 5


def test_snapshot_time_travel_and_vacuum(spark, tmp_path):
    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    df1 = spark.range(10).withColumnRenamed("id", "k")
    df2 = spark.range(25).withColumnRenamed("id", "k")
    assert snapshots.write_snapshot(df1, table) == 0
    assert snapshots.write_snapshot(df2, table) == 1
    # historical read returns the frozen data, current the newest
    assert snapshots.read_version(spark, table, 0).count() == 10
    assert snapshots.read_version(spark, table).count() == 25
    assert snapshots.history(table) == [(0, 10), (1, 25)]
    # vacuum drops v0; the historical read now fails loudly
    assert snapshots.vacuum(table, keep_last=1) == [0]
    assert snapshots.read_version(spark, table).count() == 25
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshots.read_version(spark, table, 0)


def test_snapshot_crash_leaves_no_torn_table(spark, tmp_path):
    """A version dir without a manifest flip (crashed write) is
    invisible to readers and removed by vacuum."""
    import os

    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    snapshots.write_snapshot(spark.range(5).withColumnRenamed("id", "k"), table)
    orphan = os.path.join(table, "_versions", "v=99")
    spark.range(3).write.parquet(orphan)  # simulated crashed writer
    assert snapshots.history(table) == [(0, 5)]
    assert snapshots.read_version(spark, table).count() == 5
    snapshots.vacuum(table, keep_last=2)
    assert not os.path.exists(orphan)


def test_streaming_drains_compose_with_snapshots(spark, sf_dir, tmp_path):
    """Streaming ingestion with time travel: each availableNow drain
    lands as an immutable snapshot version — a rerun appends a NEW
    version instead of mutating the last, and historical reads stay
    frozen."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots
    from building_coffee_commodity_trading_data_warehouse_spark.streaming import (
        pipeline,
        windows as swin,
    )

    table = str(tmp_path / "agg")
    for _ in range(2):
        agg = swin.tumbling_counts(
            pipeline.stream_events(spark, f"{sf_dir}/events.parquet")
        )
        batch = pipeline.run_available_now(agg, "t_snap_compose")
        snapshots.write_snapshot(batch, table)
    hist = snapshots.history(table)
    assert [v for v, _ in hist] == [0, 1]
    n0 = snapshots.read_version(spark, table, 0).count()
    n1 = snapshots.read_version(spark, table, 1).count()
    assert n0 == n1 > 0  # same static source → same aggregate, twice


def test_seasonal_anomalies_flags_planted_spike(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    # 40 calm events at hour 3 + one 100x spike in the same cell;
    # a different hour keeps its own baseline
    rows = [
        (i, _dt.datetime(2024, 1, 1 + i % 20, 3, i % 60), 1, "view",
         10.0 + (i % 2), "{}")
        for i in range(40)
    ]
    rows.append((99, _dt.datetime(2024, 1, 5, 3, 30), 1, "view", 1000.0, "{}"))
    rows += [
        (200 + i, _dt.datetime(2024, 1, 1, 7, i), 1, "view", 10.0 + (i % 2), "{}")
        for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in aggregates.seasonal_anomalies(ev).collect()}
    assert out[99]["is_outlier"] is True
    flagged = [k for k, r in out.items() if r["is_outlier"]]
    assert flagged == [99]
    assert out[99]["hour"] == 3 and out[99]["n_obs"] == 41


def test_event_path_trigrams_known_session(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.plans import (
        analytics,
    )

    # one session a>b>c>d -> trigrams a>b>c, b>c>d; a second session
    # (90 min later) repeats a>b>c
    t0 = _dt.datetime(2024, 1, 1, 8, 0)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0 + _dt.timedelta(minutes=1), 1, "b", 1.0, "{}"),
        (3, t0 + _dt.timedelta(minutes=2), 1, "c", 1.0, "{}"),
        (4, t0 + _dt.timedelta(minutes=3), 1, "d", 1.0, "{}"),
        (5, t0 + _dt.timedelta(minutes=95), 1, "a", 1.0, "{}"),
        (6, t0 + _dt.timedelta(minutes=96), 1, "b", 1.0, "{}"),
        (7, t0 + _dt.timedelta(minutes=97), 1, "c", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["path"]: r["n"] for r in analytics.event_path_trigrams(ev).collect()}
    assert got == {"a>b>c": 2, "b>c>d": 1}


def test_benford_counts_and_expectations(spark):
    import math

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    # 30 values with digit 1, 10 with digit 9
    rows = [(float(100 + i),) for i in range(30)] + [(900.5,)] * 10
    df = spark.createDataFrame(rows, "o_totalprice double")
    out = {r["digit"]: r for r in aggregates.benford_digits(df).collect()}
    assert out[1]["n_obs"] == 30 and out[9]["n_obs"] == 10
    assert out[1]["expected_n"] == 40 * math.log10(2)
    # chi2 term is the fixed (obs-exp)^2/exp expression
    e = out[9]["expected_n"]
    assert out[9]["chi2_term"] == (10 - e) * (10 - e) / e


def test_markov_transitions_probabilities(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    t0 = _dt.datetime(2024, 1, 1, 9, 0)
    seq = ["a", "b", "a", "b", "c"]
    rows = [
        (i, t0 + _dt.timedelta(minutes=i), 1, et, 1.0, "{}")
        for i, et in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["p"])
        for r in aggregates.markov_transitions(ev).collect()
    }
    # transitions: a>b (x2), b>a, b>c
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 0.5) and got[("b", "c")] == (1, 0.5)


def test_sign_runs_known_sequence(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    # values 1,2,3,3,2,4 -> diffs +1,+1,0,-1,+2 -> signs (flat dropped)
    # +,+,-,+ -> runs: [++][-][+] = 3
    ys = [1.0, 2.0, 3.0, 3.0, 2.0, 4.0]
    rows = [
        (i, _dt.datetime(2024, 1, 1, 0, i), 7, "t", y, "{}")
        for i, y in enumerate(ys)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = aggregates.sign_runs(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_moves"], r["n_up"], r["n_down"], r["n_runs"]) == (4, 3, 1, 3)


def test_aqp_estimates_exact_replay_and_bound(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    # inv_fraction=1 -> the "sample" is everything: estimate == exact
    docs = spark.createDataFrame(
        [(i, "P", 100.0 + i) for i in range(40)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    out = aggregates.aqp_group_estimates(docs, inv_fraction=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sample"] == r["n_exact"] == 40
    assert r["est_rev"] == r["exact_rev"] and r["rel_err_ok"] == 1


def test_ks_drift_matches_scipy_style_definition(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    a_vals = [1.0, 2.0, 3.0, 4.0]
    b_vals = [3.0, 4.0, 5.0, 6.0]
    rows = [
        (i, _dt.datetime(2024, 1, 1), 1, "click", v, "{}")
        for i, v in enumerate(a_vals)
    ] + [
        (100 + i, _dt.datetime(2024, 1, 1), 1, "view", v, "{}")
        for i, v in enumerate(b_vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = aggregates.ks_drift(ev).collect()
    assert len(out) == 1
    r = out[0]
    # at v=2: F_a = 2/4, F_b = 0 -> D = 0.5 (the max)
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_stat"] == 0.5 and r["ks_num"] == 8


def test_ks_drift_identical_distributions_zero(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    rows = [
        (i, _dt.datetime(2024, 1, 1), 1, t, float(i % 5), "{}")
        for i in range(20)
        for t in ("click", "view")
    ]
    ev = spark.createDataFrame(
        [(i * 2 + j, ts, u, t, v, p) for i, (_, ts, u, t, v, p) in enumerate(rows) for j in [0]],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = aggregates.ks_drift(ev).collect()[0]
    assert r["ks_num"] == 0 and r["ks_stat"] == 0.0


def test_cramers_v_perfect_and_independent(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    # perfect association: type 'a' only on Mondays, 'b' only on Tuesdays
    mon, tue = _dt.datetime(2024, 1, 1, 9), _dt.datetime(2024, 1, 2, 9)
    rows = [(i, mon, 1, "a", 1.0, "{}") for i in range(20)]
    rows += [(100 + i, tue, 1, "b", 1.0, "{}") for i in range(20)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = aggregates.cramers_v(ev).collect()[0]
    assert (r["r"], r["c"], r["n"]) == (2, 2, 40)
    assert abs(r["cramers_v"] - 1.0) < 1e-8

    # independence: both types on both days in equal counts -> V ~ 0
    rows = [(i, mon, 1, t, 1.0, "{}") for i, t in enumerate(["a", "b"] * 10)]
    rows += [(100 + i, tue, 1, t, 1.0, "{}") for i, t in enumerate(["a", "b"] * 10)]
    ev2 = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r2 = aggregates.cramers_v(ev2).collect()[0]
    assert r2["cramers_v"] < 1e-6


def test_mann_kendall_monotone_and_flat(spark):
    import datetime as _dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    rows = [
        (i, _dt.datetime(2024, 1, 1, 0, i), 1, "t", float(i), "{}")
        for i in range(10)
    ]  # strictly increasing -> tau = 1
    rows += [
        (100 + i, _dt.datetime(2024, 1, 1, 0, i), 2, "t", 5.0, "{}")
        for i in range(10)
    ]  # constant -> S = 0, tau = 0
    rows += [
        (200 + i, _dt.datetime(2024, 1, 1, 0, i), 3, "t", float(9 - i), "{}")
        for i in range(10)
    ]  # strictly decreasing -> tau = -1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["user_id"]: r for r in aggregates.mann_kendall(ev).collect()}
    assert out[1]["s_stat"] == 45 and out[1]["tau"] == 1.0
    assert out[2]["s_stat"] == 0 and out[2]["tau"] == 0.0
    assert out[3]["s_stat"] == -45 and out[3]["tau"] == -1.0


def test_gini_equal_and_concentrated(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.plans import (
        analytics,
    )

    # perfectly equal: 4 customers x $100 -> G = 0
    eq = spark.createDataFrame(
        [(i, i, 100.0) for i in range(4)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    r = analytics.gini_concentration(eq).collect()[0]
    assert r["gini"] == 0.0 and r["n_customers"] == 4

    # one customer has everything meaningful: G -> (n-1)/n as the
    # small shares vanish; check against the closed form directly
    con = spark.createDataFrame(
        [(1, 1, 0.01), (2, 2, 0.01), (3, 3, 0.01), (4, 4, 1000.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    r2 = analytics.gini_concentration(con).collect()[0]
    xs = sorted([1, 1, 1, 100000])
    n = 4
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sum(xs)
    assert r2["gini"] == num / (n * sum(xs))
    assert r2["gini"] > 0.74


def test_rfm_segments_known_tiles(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.plans import (
        analytics,
    )
    import datetime as dt

    # customer i: i orders, all on Jan i -> recency 10-i days, freq i,
    # monetary 100*i. All three metrics strictly ordered, n=10, k=5 ->
    # every tile holds exactly 2 customers and cust10 is best on all
    # three axes (cell 111) while cust1 is worst (cell 555).
    rows = [
        (i, dt.datetime(2024, 1, i), 100.0)
        for i in range(1, 11)
        for _ in range(i)
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r["o_custkey"]: r for r in analytics.rfm_segments(orders).collect()}
    assert len(out) == 10
    for i in range(1, 11):
        r = out[i]
        assert r["recency_days"] == 10 - i
        assert r["frequency"] == i
        assert r["monetary"] == 100.0 * i
        tile = (10 - i) // 2 + 1  # 10,9 -> 1 ... 2,1 -> 5
        assert (r["r_score"], r["f_score"], r["m_score"]) == (tile,) * 3
        assert r["rfm_cell"] == tile * 111

    # n < k: NTILE(5) over 3 rows = tiles 1..3, one row each
    small = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, i), 100.0 * i) for i in (1, 2, 3)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    tiles = {
        r["o_custkey"]: r["m_score"]
        for r in analytics.rfm_segments(small).collect()
    }
    assert tiles == {3: 1, 2: 2, 1: 3}


def test_ntile_formula_matches_sql_standard(spark):
    """_ntile_from_rank must reproduce SQL NTILE for EVERY (n, k, rank)
    combination in a dense sweep — the first n mod k tiles carry the
    extra row. One Spark job; the reference tiling is computed in
    plain Python from the standard's definition."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans.analytics import (
        _ntile_from_rank,
    )
    from pyspark.sql import functions as F

    rows = [
        (n, k, r)
        for n in (1, 2, 3, 4, 5, 7, 10, 11, 50, 53)
        for k in (1, 2, 3, 5, 7)
        for r in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "n long, k long, r long")
    got = {}
    for k in (1, 2, 3, 5, 7):
        part = df.filter(F.col("k") == k).withColumn(
            "tile", _ntile_from_rank("r", "n", k).cast("int")
        )
        for row in part.collect():
            got[(row["n"], k, row["r"])] = row["tile"]
    for n, k, r in rows:
        q, rem = divmod(n, k)
        # tiles 1..rem have q+1 rows, the rest have q
        expected, acc = None, 0
        for t in range(1, k + 1):
            acc += q + 1 if t <= rem else q
            if r <= acc:
                expected = t
                break
        assert got[(n, k, r)] == expected, (n, k, r, got[(n, k, r)], expected)
