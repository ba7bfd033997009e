"""Physical-plan pins (SURVEY.md §4): the scale-critical plan
properties are asserted, not assumed — a regression that adds a
shuffle or loses a broadcast fails here before it costs hours at
100 TB."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark import catalog
from building_coffee_commodity_trading_data_warehouse_spark.operators import joins, windows
from building_coffee_commodity_trading_data_warehouse_spark.plans import explain


def _exchanges(df) -> int:
    return len(re.findall(r"Exchange hashpartitioning", explain.plan_string(df)))


def test_flagship_two_exchanges(spark, sf_dir):
    """All l_partkey windows (lead/lag + prefix-sum means) stack on one
    exchange; the per-day spread adds exactly one more."""
    df = windows.flagship(catalog.table(spark, sf_dir, "lineitem"))
    assert _exchanges(df) == 2


def test_star_join_is_all_broadcast(spark, sf_dir):
    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    df = joins.star_join(t("orders"), t("customer"), t("nation"), t("region"))
    plan = explain.plan_string(df)
    assert plan.count("BroadcastHashJoin") == 3
    assert _exchanges(df) == 0  # the fact side never shuffles


def test_global_sort_is_top_n(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    partition top-N + merge), never a full global sort."""
    df = (
        catalog.table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )
    assert "TakeOrderedAndProject" in explain.plan_string(df)


def test_grouped_agg_has_partial_aggregation(spark, sf_dir):
    """Map-side partial aggregation before the exchange (the 100 TB
    default: combine before shuffling)."""
    df = (
        catalog.table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = explain.plan_string(df)
    first_agg = plan.index("HashAggregate")
    exch = plan.index("Exchange hashpartitioning")
    # plan prints top-down: final agg, exchange, then the partial agg
    assert "partial_count" in plan
    assert first_agg < exch


def test_whole_stage_codegen_covers_flagship(spark, sf_dir):
    # AQE wraps the plan before codegen spans are visible — inspect the
    # non-adaptive physical plan for this assertion only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = windows.flagship(catalog.table(spark, sf_dir, "lineitem"))
        plan = explain.plan_string(df)
        # codegen'd operators print as '*(N) Op' in the physical plan;
        # projections and sorts around every window must be fused
        spans = set(re.findall(r"\*\((\d+)\)", plan))
        assert len(spans) >= 4, plan[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key with the same bucket count
    must sort-merge-join with ZERO shuffle exchanges — the write-once
    co-location contract of plans.ingest.write_bucketed."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans.ingest import write_bucketed

    orders = catalog.table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = catalog.table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(orders, "b_orders", ["o_orderkey"], buckets=8)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            ["o_orderkey"],
            buckets=8,
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        n_rows = joined.count()
        assert n_rows == li.count()  # every lineitem has its order
        assert _exchanges(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
