"""Every declared query must hash-match its DuckDB oracle — the local
twin of the driver's CORRECTNESS gate. New queries added to
``__spark_entry__.queries()`` are picked up automatically."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from building_coffee_commodity_trading_data_warehouse_spark.testing.compare import compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_every_query_has_callable():
    assert _QUERIES, "no queries declared"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    assert name in _QUERIES, f"oracle for undeclared query {name}"
    rep = compare(_QUERIES[name](spark, sf_dir), _ORACLES[name], sf_dir)
    assert rep["ok"], f"{name}: {rep['detail']} (spark={rep['spark_rows']} oracle={rep['oracle_rows']})"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()


def test_approx_percentiles_error_bound(spark, sf_dir):
    """The sketch path (rows-only driver gate) is pinned against the
    exact operator here: min/max/count identical, quartiles within one
    quantity unit (approx_percentile returns a data value; exact
    interpolates between adjacent values)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    li = entry_mod._t(spark, sf_dir, "lineitem")
    exact = {r["l_returnflag"]: r for r in aggregates.quantity_percentiles(li).collect()}
    approx = {
        r["l_returnflag"]: r
        for r in aggregates.quantity_percentiles_approx(li).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        assert (a["q_min"], a["q_max"], a["n_rows"]) == (
            e["q_min"], e["q_max"], e["n_rows"],
        )
        for q in ("q25", "q50", "q75"):
            assert abs(a[q] - e[q]) <= 1.0, (flag, q, a[q], e[q])


def test_certified_sketch_gates_all_true(spark, sf_dir):
    """The certified sketch variants (VERDICT r4 item 7) embed their
    error-bound contract as boolean columns — every boolean must be
    TRUE on real data, making the bound part of the driver hash."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
        similarity,
    )
    from pyspark.sql import functions as F

    li = entry_mod._t(spark, sf_dir, "lineitem")
    for row in aggregates.distinct_counts_certified(li).collect():
        assert row["parts_ok"] and row["supps_ok"] and row["orders_ok"], row
    for row in aggregates.quantity_percentiles_certified(li).collect():
        assert row["q25_ok"] and row["q50_ok"] and row["q75_ok"], row
    emb = entry_mod._t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    for row in similarity.ivf_topk_certified(emb, qs).collect():
        assert row["recall_ok"] and row["mean_recall_ok"], row


def test_sketch_rollup_planted_overlap(spark, sf_dir):
    """Rollup semantics on a planted frame: fine groups share members
    (the same order id under both statuses), so a SUM of fine counts
    would double-count — the sketch union must NOT (it estimates the
    true distinct union). Certificate booleans hold on real data too."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    rows = [("A", s, i) for s in ("F", "O") for i in range(200)] + [
        ("B", "F", i) for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, l_orderkey long"
    )
    got = {
        r["l_returnflag"]: r
        for r in aggregates.sketch_rollup(
            df, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_orderkey"
        ).collect()
    }
    # 200 distinct under A (each appears in TWO fine groups), 50 under B
    assert got["A"]["n_exact"] == 200 and got["B"]["n_exact"] == 50
    for r in got.values():
        assert r["merge_close_ok"] and r["bound_ok"], r

    li = entry_mod._t(spark, sf_dir, "lineitem")
    for r in aggregates.sketch_rollup(
        li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_orderkey"
    ).collect():
        assert r["merge_close_ok"] and r["bound_ok"], r
