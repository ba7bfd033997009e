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
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = windows.flagship(catalog.table(spark, sf_dir, "lineitem"))
        plan = explain.plan_string(df)
        # codegen'd operators print as '*(N) Op' in the physical plan;
        # projections and sorts around every window must be fused
        spans = set(re.findall(r"\*\((\d+)\)", plan))
        assert len(spans) >= 4, plan[:500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def test_stratified_sample_is_pure_filter(spark, sf_dir):
    """Per-stratum sampling must stay a projection+filter: zero
    exchanges, no aggregation, and the scan parallelism untouched."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import curate

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.length("text") < 250, "short").otherwise("long").alias("stratum"),
    )
    df = curate.stratified_sample(docs, "stratum", {"short": 1.0}, 0.05)
    plan = explain.plan_string(df)
    assert _exchanges(df) == 0
    assert "Aggregate" not in plan and "Join" not in plan


def test_pack_chunks_single_shard_exchange(spark, sf_dir):
    """Packing shuffles once on the shard column — the parallelism
    unit — and never adds a global (single-partition) sort."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import curate

    ch = curate.chunk_documents(
        catalog.table(spark, sf_dir, "documents"), 64, 48
    ).withColumn("shard", F.pmod("doc_id", F.lit(4)))
    df = curate.pack_chunks(ch, max_tokens=256, shard_col="shard")
    plan = explain.plan_string(df)
    assert _exchanges(df) == 1
    assert "hashpartitioning(shard" in plan
    assert "Exchange SinglePartition" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set must broadcast into the semi-join; the
    corpus shingle stream itself never hash-shuffles for it."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import dedup

    docs = catalog.table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    df = dedup.decontaminate(docs, bench, n=3)
    plan = explain.plan_string(df)
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan)


def test_asof_bucketed_partitions_by_key_and_bucket(spark):
    """The skew variant's heavy window must hash-partition on
    (key, time-bucket) — the whole point of the pre-split."""
    import datetime as dt

    from building_coffee_commodity_trading_data_warehouse_spark.operators import asof

    t0 = dt.datetime(2024, 1, 1)
    trades = spark.createDataFrame(
        [(1, "A", t0)], "trade_id long, key string, ts timestamp"
    )
    quotes = spark.createDataFrame(
        [(9, "A", t0, 1.0)], "qid long, key string, ts timestamp, px double"
    )
    df = asof.asof_join_bucketed(
        trades, quotes, ["key"], "ts", "ts", ["px"], "qid", bucket_seconds=3600
    )
    plan = explain.plan_string(df)
    assert re.search(r"hashpartitioning\(key[^)]*__asof_bucket", plan)


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


def test_analytics_queries_broadcast_dims_and_topn(spark, sf_dir):
    """The classic-warehouse plans (plans/analytics.py) must keep every
    dim lookup broadcast and terminate top-N in TakeOrderedAndProject;
    the only hash exchanges allowed are the orderkey fact join and the
    group-by — the shape that survives 100 TB."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        q3 = analytics.shipping_priority(t("customer"), t("orders"), t("lineitem"))
        plan = explain.plan_string(q3)
        assert "TakeOrderedAndProject" in plan
        assert plan.count("BroadcastHashJoin") >= 1  # segment semi-join
        # fact join on orderkey + final agg: at most 3 hash exchanges
        assert _exchanges(q3) <= 3

        q10 = analytics.returned_item_customers(
            t("customer"), t("orders"), t("lineitem"), t("nation")
        )
        plan10 = explain.plan_string(q10)
        assert "TakeOrderedAndProject" in plan10
        # customer + nation joins onto the aggregated result: broadcast
        assert plan10.count("BroadcastHashJoin") >= 2

        q5 = analytics.local_supplier_volume(
            t("customer"), t("orders"), t("lineitem"),
            t("supplier"), t("nation"), t("region"),
        )
        plan5 = explain.plan_string(q5)
        assert plan5.count("BroadcastHashJoin") >= 3  # cust, supp, nation
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def test_top_suppliers_no_single_partition_funnel(spark, sf_dir):
    """The global max over the per-supplier aggregate must be a 1-row
    aggregate broadcast back — never an empty-partitionBy() window,
    which funnels the whole aggregate through ONE task."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    df = analytics.top_suppliers(
        catalog.table(spark, sf_dir, "supplier"),
        catalog.table(spark, sf_dir, "lineitem"),
    )
    plan = explain.plan_string(df)
    assert "Window" not in plan
    # the only SinglePartition exchange allowed is the 1-row global max
    # partial->final merge; the per-supplier aggregate itself must not
    # funnel (its exchange is hashpartitioning on l_suppkey)
    assert "hashpartitioning(l_suppkey" in plan
    assert plan.count("BroadcastExchange") >= 2  # global max + supplier dim


def test_trading_windows_single_exchange(spark, sf_dir):
    """Each trading window operator (EWMA, drawdown, rolling vol,
    OHLCV bars, order cadence) must run on exactly ONE hash exchange —
    the window/aggregate shares the key partitioning, nothing funnels
    through a single partition."""
    import __spark_entry__ as entry_mod

    for name in (
        "w_ewma",
        "w_drawdown",
        "w_rolling_volatility",
        "w_ohlcv_bars",
        "q_order_cadence",
    ):
        df = entry_mod.queries()[name](spark, sf_dir)
        plan = explain.plan_string(df)
        assert _exchanges(df) == 1, (name, plan)
        assert "Exchange SinglePartition" not in plan, name


def test_pareto_no_unbounded_single_partition(spark, sf_dir):
    """The Pareto prefix sum must not run a global window over the
    per-customer aggregate: every SinglePartition exchange in the plan
    sits over a bounded relation (1-row stats, <=64-row bucket
    totals), and the customer-cardinality windows partition by the
    value bucket."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_pareto_customers"](spark, sf_dir)
    plan = explain.plan_string(df)
    # the per-bucket running sum partitions by __b
    assert re.search(r"Window .*windowspecdefinition\(__b", plan), plan
    # EVERY empty-partitionBy window spec must be the bucket-totals
    # offset window (ordered by __b DESC over ≤ n_buckets rows). A
    # windowspecdefinition whose FIRST argument carries a sort
    # direction has no partition key — if one ever appears over a
    # customer-cardinality column (revenue, custkey), that's the
    # global-funnel regression this test exists to block.
    first_args = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    empty_partition = [a for a in first_args if " DESC" in a or " ASC" in a]
    assert empty_partition, plan  # the bucket-totals offset window
    for a in empty_partition:
        assert a.startswith("__b#"), (a, plan)


def test_ngram_join_broadcasts_stop_list_not_vocabulary(spark, sf_dir):
    """The df-cap must run as a broadcast LEFT ANTI join against the
    tiny stop-shingle list (df > max_df, provably ≤ rows/max_df
    entries) — never as an inner join broadcasting the KEPT shingle
    dictionary, which is vocabulary-sized (billions of shingles at
    100 TB) and OOMs every executor."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import dedup

    docs = catalog.table(spark, sf_dir, "documents")
    # kill size-based auto-broadcast: at test scale Spark happily
    # broadcasts the whole shingle side of the pair self-join (correct
    # for tiny data, impossible at 100 TB). With the threshold off,
    # every surviving BroadcastHashJoin is an explicit hint — exactly
    # the set this test audits.
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for fn in (dedup.ngram_jaccard_pairs, dedup.containment_pairs):
            df = fn(docs, strategy="join", max_df=50)
            plan = explain.plan_string(df)
            assert re.search(
                r"BroadcastHashJoin .*LeftAnti, BuildRight", plan
            ), plan[:800]
            # every hinted broadcast on the shingle key must be the
            # stop-list anti-join — a hinted INNER broadcast there is
            # the kept-dictionary anti-pattern
            for line in plan.splitlines():
                if "BroadcastHashJoin" in line and "shingle" in line:
                    assert "LeftAnti" in line, line
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_shipmode_priority_residual_predicate_and_pruning(spark, sf_dir):
    """Q12 shape: the lateness predicate rides INSIDE the orderkey join
    (residual condition — disqualified rows never reach the aggregate),
    both scans are pruned to the 3 referenced columns, and counting is
    partial→final (map-side combine before the one agg exchange)."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    plan = explain.plan_string(
        analytics.shipmode_priority_mix(t("lineitem"), t("orders"))
    )
    join_line = next(l for l in plan.splitlines() if "Join" in l and "orderkey" in l)
    assert "INTERVAL '60' DAY" in join_line, join_line
    assert "struct<l_orderkey:bigint,l_returnflag:string,l_shipdate" in plan
    assert "struct<o_orderkey:bigint,o_orderdate" in plan
    assert "partial_sum" in plan and "partial_count" in plan


def test_skew_report_heap_topn_and_broadcast_stats(spark, sf_dir):
    """The hottest-keys cut is a per-partition heap (never a global
    sort) and the corpus-wide stats attach as a 1-row broadcast."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import maintenance

    plan = explain.plan_string(
        maintenance.skew_report(catalog.table(spark, sf_dir, "lineitem"), "l_suppkey")
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan
    # the per-key frame is cached: both branches read InMemoryTableScan,
    # so lineitem is scanned once no matter how many consumers
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_basket_pairs_no_join_two_exchanges(spark, sf_dir):
    """Pairs generate array-natively inside each order row: the plan
    must contain NO join at all and exactly two hash exchanges (the
    orderkey fold and the pair count) — the naive self-join shape
    costs four exchanges plus a corpus-sized join. Top-N terminates
    in TakeOrderedAndProject."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    df = analytics.basket_pairs(catalog.table(spark, sf_dir, "lineitem"))
    plan = explain.plan_string(df)
    assert "Join" not in plan, plan
    assert _exchanges(df) == 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_market_concentration_aggregates_before_dim_join(spark, sf_dir):
    """Aggregate-first: the supplier-revenue fold (l_suppkey exchange)
    must run BEFORE the supplier dim join — the join then moves one
    row per supplier, never fact rows — and nation stays broadcast."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    df = analytics.market_concentration(t("lineitem"), t("supplier"), t("nation"))
    plan = explain.plan_string(df)
    assert "BroadcastHashJoin" in plan  # nation (25 rows)
    # the fact fold appears below (after, in top-down print) the join
    # machinery: there is exactly one suppkey exchange feeding a
    # partial aggregate over lineitem columns.
    assert re.search(r"Exchange hashpartitioning\(l_suppkey", plan), plan


def test_active_users_explodes_presence_not_events(spark, sf_dir):
    """The rolling-window explode must run on the distinct (day, user)
    presence frame (post-aggregation), not the raw event stream: the
    plan's Generate node consumes the output of a distinct aggregate,
    and no exchange partitions on event_id."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        aggregates,
    )

    df = aggregates.active_users(catalog.table(spark, sf_dir, "events"))
    plan = explain.plan_string(df)
    assert "Generate explode" in plan, plan
    assert not re.search(r"Exchange hashpartitioning\(event_id", plan), plan
    gen = plan.index("Generate explode")
    # below the Generate (printed after it) there must be an aggregate
    # — the presence distinct — before any scan of events.
    tail = plan[gen:]
    assert "HashAggregate" in tail[: tail.index("Scan")], plan


def test_dynamic_partition_pruning_on_date_partitioned_fact(spark, sf_dir, tmp_path):
    """At 100 TB the killer scan pattern is a date-partitioned fact
    joined to a FILTERED dim on the partition column: static pruning
    cannot see through the join, so Spark must insert a dynamic-
    pruning subquery (the dim's broadcast reused as a partition
    filter). Pin that the scan carries a dynamicpruning expression —
    without it the fact scan reads every partition."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import ingest

    orders = catalog.table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "fact")
    ingest.truncate_reload(orders, path, partition_by="o_month")
    fact = spark.read.parquet(path)
    # the dim must be an independent SOURCE filtered on a NON-join
    # attribute — a filter on the join column itself constant-folds
    # into a static partition filter and never needs DPP.
    dpath = str(tmp_path / "dim")
    orders.select("o_month").distinct().withColumn(
        "season", F.pmod(F.substring("o_month", 6, 2).cast("int"), F.lit(2))
    ).write.parquet(dpath)
    dim = spark.read.parquet(dpath).filter(F.col("season") == 1)
    joined = fact.join(dim, "o_month").groupBy("o_month").count()
    plan = explain.plan_string(joined)
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """Salting (joins.salted_join) is the declared skew tool; AQE's
    runtime skew-join split is the safety net. Prove the net exists:
    with thresholds tuned down, a 90%-one-key join must show
    OptimizeSkewedJoin handling in the FINAL adaptive plan."""
    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "4",
    }
    prior = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("r"),
        )
        joined = left.join(right, "k").groupBy().count()
        joined.collect()  # AQE decides at runtime — run it
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final or "OptimizeSkewedJoin" in final, final[:2000]
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_on_selective_join(spark, sf_dir):
    """DPP's sibling for NON-partition columns: a selective dim filter
    should inject a runtime bloom filter (might_contain) into the fact
    scan side so most rows drop before the shuffle — the second
    runtime net the 100 TB posture leans on."""
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # test tables sit under the 10GB production default — the
        # threshold exists exactly so SMALL scans skip the filter, so
        # drop it to emulate a 100 TB fact side.
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = catalog.table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        sel = (
            catalog.table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().count()
        plan = explain.plan_string(joined)
        assert "might_contain" in plan or "bloom" in plan.lower(), plan[:3000]
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_waiting_suppliers_single_fact_scan_no_self_join(spark, sf_dir):
    """Q21 shape: the EXISTS / NOT EXISTS pair must decorrelate into
    one per-order aggregate — lineitem is scanned ONCE (the naive plan
    self-joins the fact and scans it twice), the supplier census folds
    with map-side partial aggregation, and top-N terminates in
    TakeOrderedAndProject rather than a global sort."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    plan = explain.plan_string(
        analytics.waiting_suppliers(t("lineitem"), t("orders"), t("supplier"))
    )
    assert plan.count("lineitem.parquet") == 1, plan
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_min_cost_supplier_window_is_part_partitioned(spark, sf_dir):
    """Q2 shape: the correlated-MIN decorrelation must rank inside
    l_partkey partitions — no windowspecdefinition with an empty
    partition clause (that would funnel every (part, supplier) row
    through one task at 100 TB)."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    plan = explain.plan_string(
        analytics.min_cost_supplier(
            t("lineitem"), t("part"), t("supplier"), t("nation"), t("region")
        )
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert spec.startswith("l_partkey"), spec
    assert "TakeOrderedAndProject" in plan


def test_important_stock_total_is_broadcast_not_window(spark, sf_dir):
    """Q11 shape: the scalar HAVING subquery must arrive as a 1-row
    broadcast (BroadcastNestedLoopJoin over the folded total), never
    as an empty-partition window over the per-part relation."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    plan = explain.plan_string(
        analytics.important_stock(t("lineitem"), t("supplier"), t("nation"))
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    # per_part is persisted: both the threshold side and the 1-row
    # total read the SAME InMemoryRelation, so the fact is scanned
    # once at runtime even though the printed lineage repeats it.
    assert "InMemoryTableScan" in plan, plan


def test_promotion_candidates_single_scan_broadcast_keys(spark, sf_dir):
    """Q20 shape: the three nested subqueries must collapse to one
    conditional aggregate — lineitem scanned ONCE, the name-filtered
    part keys broadcast into the semi-join (BroadcastHashJoin ...
    LeftSemi), totals partial-aggregated map-side."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    t = lambda n: catalog.table(spark, sf_dir, n)  # noqa: E731
    plan = explain.plan_string(
        analytics.promotion_candidates(
            t("lineitem"), t("part"), t("supplier"), t("nation")
        )
    )
    assert plan.count("lineitem.parquet") == 1, plan
    assert re.search(r"BroadcastHashJoin \[l_partkey[^\]]*\], \[p_partkey[^\]]*\], LeftSemi", plan), plan
    assert "partial_sum" in plan


def test_zorder_write_narrows_per_file_ranges(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER effectiveness: after a Morton-clustered rewrite
    on (l_orderkey, l_partkey), the summed per-file value span of BOTH
    columns must shrink versus a round-robin layout — that span is
    exactly what parquet footer min/max skipping prunes against."""
    from pyspark.sql import functions as F

    from building_coffee_commodity_trading_data_warehouse_spark import catalog
    from building_coffee_commodity_trading_data_warehouse_spark.plans import (
        maintenance,
    )

    li = catalog.table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    xr = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    yr = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()

    zpath, rpath = str(tmp_path / "zorder"), str(tmp_path / "roundrobin")
    maintenance.zorder_table(
        li, zpath, "l_orderkey", "l_partkey",
        (xr[0], xr[1]), (yr[0], yr[1]), n_files=8,
    )
    li.repartition(8).write.mode("overwrite").parquet(rpath)

    def span_sum(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return per_file.agg(F.sum("span")).first()[0]

    for col in ("l_orderkey", "l_partkey"):
        z, r = span_sum(zpath, col), span_sum(rpath, col)
        assert z < 0.7 * r, (col, z, r)
    # content unchanged by the layout-only rewrite
    a = spark.read.parquet(zpath).agg(
        F.count(F.lit(1)), F.sum("l_orderkey"), F.sum("l_partkey")
    ).first()
    b = li.agg(F.count(F.lit(1)), F.sum("l_orderkey"), F.sum("l_partkey")).first()
    assert tuple(a) == tuple(b)


def test_dsir_single_explode_and_scalar_broadcast(spark, sf_dir):
    """DSIR importance (r15 shape): the token explode+count feeds both
    consumers — it must be persisted (InMemoryTableScan) so the corpus
    explodes ONCE; the three corpus scalars must arrive as a 1-row
    broadcast (BroadcastNestedLoopJoin); the per-term c_r/c_t stats
    ride ONE term-keyed window over the scored pass's own exchange
    (guide §2.4 — the r14 shape built, persisted and equi-joined a
    separate per_term table: one more exchange, one more cached
    frame); and NO per-term equi-join (SortMergeJoin/ShuffledHashJoin)
    may appear."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import curate

    docs = catalog.table(spark, sf_dir, "documents")
    plan = explain.plan_string(curate.dsir_importance(docs, ["src0", "src1"]))
    assert "InMemoryTableScan" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    # one window partition spec (term), evaluating both sums together
    assert plan.count("Window [") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # exactly one documents file scan in the printed lineage outside
    # cached subtrees would be ideal; at minimum the explode-count
    # aggregate must not appear more than once outside InMemoryRelation
    body = plan.split("InMemoryRelation", 1)[0]
    assert body.count("Generate explode") <= 1, body


def test_tokenize_outside_lambda_no_per_position_resplit(spark, sf_dir):
    """Guards the CSE-through-lambda fix: split(text) must never
    appear INSIDE a higher-order lambdafunction body — Spark evaluates
    the lambda body per array element with no common-subexpression
    elimination, so an embedded split re-tokenizes the document once
    per position (O(len²); measured 3× wall on the span/shingle
    family)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        dedup,
        textstats,
    )

    docs = catalog.table(spark, sf_dir, "documents")
    for df in (
        dedup.shingles(docs, 3),
        dedup.repeated_spans(docs),
        textstats.bigram_counts(docs),
    ):
        plan = explain.plan_string(df)
        for m in re.finditer(r"lambdafunction\(", plan):
            # scan the lambda body up to its closing paren depth
            depth, i = 1, m.end()
            while depth and i < len(plan):
                if plan[i] == "(":
                    depth += 1
                elif plan[i] == ")":
                    depth -= 1
                i += 1
            assert "split(" not in plan[m.end():i], plan[m.end():i][:200]


def test_lateral_topk_decorrelates_no_nested_loop_per_row(spark, sf_dir):
    """The correlated LATERAL top-2 must decorrelate into a single
    join plus a per-nation rank — not a nested-loop that re-executes
    the subquery per outer row (which at 100 TB scans the inner table
    once per nation)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_lateral_topk"](spark, sf_dir)
    plan = explain.plan_string(df)
    assert plan.count("customer.parquet") == 1, plan
    assert "CartesianProduct" not in plan


def test_hinted_join_uses_shuffled_hash(spark, sf_dir):
    """The shuffle_hash hint must produce a ShuffledHashJoin (no sort
    passes), and the same call with merge must produce SortMergeJoin —
    the hint controls the physical strategy, nothing else."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import joins

    li = catalog.table(spark, sf_dir, "lineitem").select("l_orderkey")
    od = catalog.table(spark, sf_dir, "orders").select("o_orderkey")
    cond = F.col("l_orderkey") == F.col("o_orderkey")
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sh = explain.plan_string(joins.hinted_join(li, od, cond, "shuffle_hash"))
        sm = explain.plan_string(joins.hinted_join(li, od, cond, "merge"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    assert "ShuffledHashJoin" in sh, sh
    assert "SortMergeJoin" in sm, sm


def test_global_row_numbers_values_and_plan(spark):
    """Dense ids match the empty-OVER ROW_NUMBER semantics on shuffled
    input, and the corpus-sized row_number window is partitioned by
    the value bucket — the only SinglePartition window in the plan is
    the ≤n_buckets offset prefix sum."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import windows as W

    rows = [(k * 7 % 101, f"v{k}") for k in range(101)]  # shuffled unique keys
    df = spark.createDataFrame(rows, "k long, v string").repartition(8)
    out = W.global_row_numbers(df, "k", n_buckets=16)
    got = {r["k"]: r["row_num"] for r in out.collect()}
    for rank, key in enumerate(sorted(k for k, _ in rows), start=1):
        assert got[key] == rank
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-sized row_number window must be keyed by the bucket
    # column (an unkeyed spec would read "windowspecdefinition(k#...")
    assert re.search(r"row_number\(\) windowspecdefinition\(__b#\d+L?, k#", plan), plan
    # offsets join is broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan


def test_sparse_cosine_plan_broadcast_anti_no_cartesian(spark):
    """The stop-term prune must be a BROADCAST LeftAnti (the stop list
    is tiny by the df-cap bound) and nothing in the plan may fall back
    to a cartesian/BNLJ — the inverted-index join is equality-keyed."""
    import re

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        similarity,
    )

    docs = spark.createDataFrame(
        [(i, f"the a{i} b{i % 3}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        similarity.sparse_cosine_pairs(docs, max_df=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_canonical_plan_uses_aggregate_not_window(spark):
    """The keeper argmax must be a max_by AGGREGATE keyed by cluster
    (map-side partials), never a per-cluster window — at corpus scale
    nearly every cluster is a singleton and a window would rank groups
    of one over a full sort."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"t{i}", i * 2) for i in range(20)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    plan = (
        dedup.cluster_canonical(docs, pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "max_by" in plan, plan
    assert "Window" not in plan, plan


def test_cusum_windows_share_one_user_exchange(spark):
    """Both window functions (running sum, running min) and the stats
    join must reuse the SAME user_id hash partitioning: exactly two
    hash exchanges total (one for the per-user stats aggregate, one
    for the windows) and zero single-partition exchanges."""
    import datetime as _dt
    import re

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        windows as W,
    )

    rows = [
        (i, _dt.datetime(2024, 1, 1, 0, i % 60), i % 3, "t", float(i), "{}")
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    plan = (
        W.cusum_changepoints(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_rfm_no_unbounded_single_partition(spark, sf_dir):
    """rfm_segments' three NTILE ranks must stay bucketed: the
    customer-cardinality windows all partition by the value bucket
    __b, and every empty-partitionBy window spec is a bucket-offset
    frame over ≤ n_buckets rows. A global NTILE/row_number window over
    the customer frame is the funnel regression this blocks."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q_rfm_segments"](spark, sf_dir)
    plan = explain.plan_string(df)
    assert re.search(r"Window .*windowspecdefinition\(__b", plan), plan
    first_args = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    empty_partition = [a for a in first_args if " DESC" in a or " ASC" in a]
    assert empty_partition, plan  # the three bucket-offset windows
    for a in empty_partition:
        assert a.startswith("__b#"), (a, plan)
    # no NTILE physical node anywhere — tiles are arithmetic
    assert "ntile" not in plan.lower(), plan


def test_duplicate_payments_banded_join_and_planted_skew(spark):
    """The double-pay screen's self-join key must include the amount
    band (pigeonhole: probe side explodes to band±1), so a power-law
    mega-customer splits across its occupied amount bands instead of
    funnelling Σn² through one task — and banding must not change a
    single pair. Planted data: one whale customer with orders spread
    across many amount bands plus in-band duplicate clusters; the
    result is checked pair-for-pair against an in-Python brute force."""
    import datetime as dt
    import itertools

    from building_coffee_commodity_trading_data_warehouse_spark.plans import analytics

    base = dt.date(1995, 1, 1)
    rows = []
    # whale: 120 orders, amounts marching 400 apart (~2.5 per $1000
    # band), every 3rd day; plus a tight duplicate cluster
    for i in range(120):
        rows.append((1000 + i, 7, 900.0 + 400.0 * i, base + dt.timedelta(days=3 * i)))
    for i in range(6):
        rows.append((2000 + i, 7, 5000.25, base + dt.timedelta(days=i)))
    # normal customers
    for c in (8, 9):
        for i in range(4):
            rows.append((3000 + 10 * c + i, c, 100.0 * c + i, base + dt.timedelta(days=40 * i)))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date"
    )
    df = analytics.duplicate_payments(
        orders.withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(15,2)"))
    )
    # plan pin: the equi-join keys include the band, and the probe
    # side explodes (Generate) — the shape that splits the whale
    plan = explain.plan_string(df)
    join_keys = re.search(r"(?:SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan)
    assert join_keys and "band" in join_keys.group(1), plan
    assert "Generate explode" in plan, plan
    got = {
        (r["order_a"], r["order_b"], r["amount_diff"], r["days_apart"])
        for r in df.collect()
    }
    cents = {k: round(p * 100) for k, _, p, _ in rows}
    byc = {k: (c, d) for k, c, _, d in rows}
    want = set()
    for x, y in itertools.combinations(sorted(cents), 2):
        if byc[x][0] != byc[y][0]:
            continue
        dc = abs(cents[x] - cents[y])
        dd = abs((byc[x][1] - byc[y][1]).days)
        if dc <= 100_000 and dd <= 30:
            want.add((x, y, dc / 100.0, dd))
    assert got == want and len(want) > 100, (len(got), len(want))


def test_chunk_documents_single_split(spark, sf_dir):
    """chunk_documents must tokenize each document exactly ONCE:
    aliasing the split in the same select as the explode left
    Catalyst evaluating split(text) both inside the Generate's
    sequence bound and in the downstream project (2 splits/row — no
    CSE across the Generate boundary; measured 2.1x the operator's
    wall at sf0.1, fixed r10 by projecting the token array first)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        curate,
    )

    docs = catalog.table(spark, sf_dir, "documents")
    df = curate.chunk_documents(docs, chunk=64, stride=48)
    plan = explain.plan_string(df)
    assert plan.count("split(text") == 1, plan
    assert "Generate explode" in plan, plan


def test_wordpiece_pairs_plan_broadcast_and_topk(spark, sf_dir):
    """The symbol-count side of the WordPiece scorer is ALPHABET-sized
    at any corpus scale — both score joins must be declared broadcast
    (never SMJ-by-statistics), the global top-100 must be a
    TakeOrderedAndProject cut with the rank window running after it
    (over ≤ topn rows, not the full pair table), and the token split
    must not be re-evaluated inside a Generate bound."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        textstats,
    )

    docs = catalog.table(spark, sf_dir, "documents")
    df = textstats.wordpiece_pair_scores(docs, topn=100)
    plan = explain.plan_string(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_lm_quality_single_split_per_scan(spark, sf_dir):
    """bigram_lm_scores builds three token streams (reference
    unigrams, reference bigrams, document bigrams); each must
    tokenize its scan exactly once: no split may leak into a Filter
    or pushed DataFilter (the ``size >= 2`` predicate used to push
    into the scan and re-tokenize every row — replaced by the
    zip_with/slice pair form), and the score pipeline must be
    persisted so the rank path and the final join don't re-execute
    it (distinct split-bearing Projects ≤ 3: one doc-side, two
    reference-side aggregates)."""
    import re

    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        textstats,
    )

    docs = catalog.table(spark, sf_dir, "documents")
    df = textstats.bigram_lm_scores(
        docs, reference=docs.filter(F.col("lang") == "en")
    )
    plan = explain.plan_string(df)
    lines = plan.split("\n")
    assert not [
        ln for ln in lines
        if "split(text" in ln and ("Filter" in ln or "DataFilters" in ln)
    ], plan
    projs = {
        re.sub(r"^[\s:+\-*]+", "", ln)
        for ln in lines
        if "Project" in ln and "split(text" in ln
    }
    assert len(projs) <= 3, sorted(projs)


def test_line_dedup_no_window_exempt_lines_skip_line_exchange(spark):
    """r10 verdict item 2: line_dedup's first-occurrence election must
    be a two-level partial AGGREGATE + equi-join, never a
    Window.partitionBy(line) — AQE can split a skewed join but not a
    skewed window exchange, and the old shape sent every blank /
    mega-duplicated line to a single window partition. Pins: (a) no
    Window anywhere; (b) the election aggregate has a map-side
    partial_min (a 10^9-copy line collapses to one partial per input
    partition before the wire); (c) EVERY line-keyed exchange sits
    above the `length >= min_line_chars` filter, so exempt lines
    never enter a line-keyed exchange at all."""
    import re as _re

    from building_coffee_commodity_trading_data_warehouse_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a line here\n\nb"), (2, "a line here\nb line\n")],
        "doc_id long, text string",
    )
    plan = (
        dedup.line_dedup(docs, min_line_chars=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "partial_min(struct(doc_id" in plan, plan
    line_exchanges = _re.findall(
        r"Exchange hashpartitioning\(line#(\d+)", plan
    )
    assert line_exchanges, plan  # the election still shuffles by line
    for expr_id in line_exchanges:
        assert f"(length(line#{expr_id}) >= 2)" in plan, (
            expr_id, plan,
        )
    # (d) heavy-hitter hybrid: a broadcast join for heavy lines
    # plus a shuffle join for the bounded light remainder
    assert "BroadcastHashJoin" in plan, plan
    # the exempt branch exists and is map-only (filter straight into
    # the doc_id-keyed rebuild, no line-keyed exchange of its own)
    assert _re.search(r"Filter \(length\(line#\d+\) < 2\)", plan), plan


def test_keeper_election_no_window_partial_agg_join(spark):
    """r10 verdict item 8: the url_dedup and web_pipeline keeper
    elections must be the shared two-level aggregate + join
    (dedup.keeper_election), never Window.partitionBy — clean_md5
    carries a guaranteed hot key (md5('') for every all-lines-dropped
    document) and canon_url a plausible one (mega-fetched front
    pages); AQE splits skewed joins, not skewed window exchanges.
    Pins per operator: no Window; a partial_min aggregate below the
    key exchange (map-side combine collapses the hot key)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        curate,
        urls,
    )

    docs = spark.createDataFrame(
        [(i, f"line {i} stays well here.\nend of doc {i}.") for i in range(8)],
        "doc_id long, text string",
    )
    wp_plan = (
        curate.web_pipeline(docs, min_words=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in wp_plan, wp_plan
    assert "partial_min(CASE WHEN" in wp_plan, wp_plan

    u = spark.createDataFrame(
        [(i, f"https://site{i % 3}.com/p?x={i}") for i in range(8)],
        "doc_id long, url string",
    )
    url_plan = (
        urls.url_dedup(u)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in url_plan, url_plan
    assert "partial_min(doc_id" in url_plan, url_plan
    assert "partial_count(1)" in url_plan, url_plan
    assert "BroadcastHashJoin" in wp_plan, wp_plan
    assert "BroadcastHashJoin" in url_plan, url_plan
