"""Classic warehouse analytics over the star schema — the BI query
shapes a commodity-trading warehouse serves daily (reference intent:
the Power BI layer consuming the ODS tables, SURVEY.md §0/§3; the
reference itself materializes only the MA/spread marts at ODS.py:59-80,
so these are the natural next queries a user of that warehouse asks).

Every query here is a composition of the operator surface the package
already proves (broadcast dim joins, shuffle fact joins, decimal-exact
aggregation, top-k) — no new physical machinery, just the plans.

Scale notes (100 TB posture):
  * Dims (customer, supplier, nation, region) are broadcast — the fact
    side (lineitem/orders) is never shuffled for a dim lookup.
  * The one unavoidable big shuffle is lineitem ⋈ orders on orderkey;
    both sides are pre-filtered (date / segment / returnflag) BEFORE
    the join so the shuffle moves only qualifying rows, and the
    parquet scan sees the pushed-down filters.
  * Revenue sums go through DECIMAL(38,6) accumulation
    (functions/exact.py) — order-independent, so results are
    bit-identical across partitionings and reruns.
  * Top-N terminates in TakeOrderedAndProject (per-partition heap +
    driver merge of N·P rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import scoped_persist

from ..functions.exact import davg, dsum

REVENUE = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    topn: int = 10,
) -> DataFrame:
    """Unshipped-revenue ranking (TPC-H Q3 shape): orders placed before
    ``cutoff`` in one market segment, revenue from line items still
    shipping after it, top-N orders by open revenue.

    Plan: segment filter prunes customers → broadcast semi to orders →
    one shuffle join to pre-filtered lineitem → hash agg on orderkey →
    TakeOrderedAndProject.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ord_f = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        ord_f.join(F.broadcast(cust), ord_f.o_custkey == cust.c_custkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(REVENUE).alias("revenue"))
        .select(
            "o_orderkey",
            F.col("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(topn)
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """Local-supplier revenue by nation (TPC-H Q5 shape): revenue from
    line items where the supplier and the ordering customer share a
    nation inside one region, grouped by nation.

    The "local" condition (c_nationkey = s_nationkey) is enforced as an
    equi-predicate after two broadcast dim joins — the fact table is
    shuffled once (lineitem ⋈ orders on orderkey); everything else is
    broadcast.
    """
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
        "left_semi",
    ).select("n_nationkey", "n_name")
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    cust = customer.select("c_custkey", "c_nationkey")
    supp = supplier.select("s_suppkey", "s_nationkey")
    return (
        li.join(ord_f, li.l_orderkey == ord_f.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(dsum(REVENUE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def returned_item_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-07-01",
    topn: int = 20,
) -> DataFrame:
    """Returned-item loss ranking (TPC-H Q10 shape): customers who
    returned the most revenue in a half-year window, with their nation.

    lineitem is filtered to returnflag='R' BEFORE the orderkey shuffle;
    customer and nation are broadcast onto the aggregated (small)
    per-customer totals — the cheapest join order at 100 TB.
    """
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    per_cust = (
        li.join(ord_f, li.l_orderkey == ord_f.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(REVENUE).alias("revenue"))
    )
    cust = customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("revenue"),
            F.col("c_acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(topn)
    )


def priority_delivery_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    late_days: int = 60,
) -> DataFrame:
    """Late-order counts per priority (TPC-H Q4 shape): orders in a
    window that have AT LEAST ONE line item shipping more than
    ``late_days`` after the order date, counted per priority.

    EXISTS decorrelates to a left_semi join keyed on orderkey with the
    lateness predicate as a residual condition — one shuffle, no
    row explosion (semi joins emit each left row at most once).
    """
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = ord_f.join(
        li,
        (ord_f.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "AMERICA",
    supp_nation: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """National market share (TPC-H Q8 shape): within one region's
    customer orders, the yearly revenue fraction supplied by one
    nation. The share is a ratio of two decimal-exact sums — a single
    conditional aggregation, not two passes.

    Plan: region-pruned customers and the supplier→nation lookup are
    broadcast; lineitem ⋈ orders is the one big shuffle; the final agg
    is per-year (tiny)."""
    cust_in_region = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    nation.n_regionkey == region.r_regionkey,
                    "left_semi",
                )
            ),
            customer.c_nationkey == F.col("n_nationkey"),
            "left_semi",
        )
    ).select("c_custkey")
    ord_f = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year"))
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord_f, F.col("l_orderkey") == ord_f.o_orderkey)
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == supp_nation, rev))
                / dsum(rev)
            ).alias("mkt_share"),
            dsum(rev).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def top_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """Top supplier(s) by quarterly revenue, ties kept (TPC-H Q15
    shape). Aggregate first (per-suppkey revenue, one shuffle); the
    global max is then a 1-ROW ``agg(F.max)`` broadcast-cross-joined
    back with an equality filter — NOT an empty-``partitionBy()``
    window, which would funnel the whole per-supplier aggregate through
    a single task's sort (fine at 10⁴ suppliers, a straggler at 10⁷).
    The partial-max runs map-side, the driver merges one row per
    partition, and the aggregate itself never re-shuffles."""
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(rev).alias("total_rev"))
    )
    global_max = per_supp.agg(F.max("total_rev").alias("max_rev"))
    winners = per_supp.crossJoin(F.broadcast(global_max)).filter(
        F.col("total_rev") == F.col("max_rev")
    )  # deliberate N×1 broadcast cross join
    return (
        winners.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            winners.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


def order_cadence(orders: DataFrame) -> DataFrame:
    """Per-customer re-order cadence: day gaps between consecutive
    orders (lag window on custkey) reduced to count / exact-decimal
    mean / min / max — the repeat-purchase-interval metric served off
    the same star schema as the reference's BI layer.

    One exchange on o_custkey serves both the window and the final
    aggregate (the groupBy key equals the window partition key, so
    AQE reuses the partitioning); gaps accumulate in DECIMAL so the
    mean is engine- and partitioning-exact."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate", 1).over(w))
    ).cast("long")
    return (
        orders.select("o_custkey", gap.alias("gap_days"))
        .filter(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("gap_days").alias("n_gaps"),
            (
                F.sum(F.col("gap_days").cast("decimal(38,6)")).cast("double")
                / F.count("gap_days")
            ).alias("mean_gap_days"),
            F.min("gap_days").alias("min_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
        )
    )


def pareto_customers(
    orders: DataFrame, share: float = 0.8, n_buckets: int = 64
) -> DataFrame:
    """ABC / Pareto analysis: the smallest prefix of customers (by
    descending revenue) that covers ``share`` of total revenue — the
    who-matters cut every commodity sales desk runs.

    Exactness: per-customer revenue and the running prefix accumulate
    in DECIMAL (order-independent); the cutoff compares exact decimals
    against ``share × total`` (share is a 1-decimal literal, so the
    product is exact too) — no float comparison at the boundary.

    Scale — a DISTRIBUTED prefix sum, not an empty-``partitionBy()``
    window (which would funnel every customer through one task — the
    exact anti-pattern top_suppliers was rewritten away from): rows
    bucket by deterministic value ranges (width_bucket over the
    broadcast min/max — a pure function of the revenue, no sampled
    boundaries), each bucket prefix-sums under its own window, and the
    cross-bucket offsets come from the tiny per-bucket totals (≤
    ``n_buckets`` rows) broadcast back. Uneven revenue distributions
    skew bucket sizes, never correctness."""
    dec = "decimal(38,6)"
    # persisted: the per-customer aggregate feeds three subtrees (stats,
    # the bucketed windows, the bucket totals) — without the cache Spark
    # re-scans orders once per subtree. One short row per customer.
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(dec)).alias("revenue_dec"))
        .transform(scoped_persist)
    )
    stats = per_cust.agg(
        F.sum("revenue_dec").alias("total_dec"),
        F.min(F.col("revenue_dec").cast("double")).alias("lo"),
        F.max(F.col("revenue_dec").cast("double")).alias("hi"),
    )
    with_stats = per_cust.crossJoin(F.broadcast(stats))
    bucket = F.when(F.col("lo") == F.col("hi"), F.lit(1)).otherwise(
        F.least(
            F.lit(n_buckets),
            F.width_bucket(
                F.col("revenue_dec").cast("double"),
                F.col("lo"),
                F.col("hi"),
                F.lit(n_buckets),
            ),
        )
    )
    bucketed = scoped_persist(with_stats.withColumn("__b", bucket))
    # within-bucket running sum (descending revenue): one exchange on __b
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.desc("revenue_dec"), F.asc("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("__cum_in", F.sum("revenue_dec").over(w_in))
    # offsets: total revenue of all HIGHER buckets (tiny relation)
    btot = bucketed.groupBy("__b").agg(F.sum("revenue_dec").alias("__btot"))
    w_off = Window.orderBy(F.desc("__b")).rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.withColumn(
        "__off", F.coalesce(F.sum("__btot").over(w_off), F.lit(0).cast(dec))
    ).select("__b", "__off")
    cum = (F.col("__cum_in") + F.col("__off")).alias("cum_dec")
    ranked = local.join(F.broadcast(offs), "__b").select(
        "o_custkey", "revenue_dec", "total_dec", cum
    )
    return ranked.filter(
        F.col("cum_dec") - F.col("revenue_dec")
        < F.col("total_dec") * F.lit(share).cast("decimal(2,1)")
    ).select(
        "o_custkey",
        F.col("revenue_dec").cast("double").alias("revenue"),
        F.col("cum_dec").cast("double").alias("cum_revenue"),
        (F.col("cum_dec").cast("double") / F.col("total_dec").cast("double")).alias(
            "cum_share"
        ),
    )


def shipmode_priority_mix(
    lineitem: DataFrame,
    orders: DataFrame,
    late_days: int = 60,
) -> DataFrame:
    """Slow-shipment priority cross-tab (TPC-H Q12 shape): among line
    items that shipped more than ``late_days`` after their order was
    placed, how many belong to critical (1-URGENT / 2-HIGH) orders vs
    everything else, per return flag — the "are slow lanes delaying
    urgent freight" question.

    Q12's physical shape: the one unavoidable big-big shuffle join
    (lineitem ⋈ orders on orderkey — no dim to broadcast), the lateness
    predicate as a residual join condition so non-qualifying rows never
    reach the aggregate, then CASE-conditional counts in a single
    partial→final hash aggregate (3 output rows)."""
    li = lineitem.select("l_orderkey", "l_returnflag", "l_shipdate")
    od = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    slow = li.join(
        od,
        (li.l_orderkey == od.o_orderkey)
        & (
            li.l_shipdate
            > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
        ),
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        slow.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("n_critical"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("n_regular"),
            F.count(F.lit(1)).alias("n_slow_lines"),
        )
        .orderBy("l_returnflag")
    )


def yoy_growth(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Year-over-year revenue growth per nation — the trend panel every
    warehouse dashboard opens with. Revenue folds decimal-exact per
    (nation, year); the previous year arrives by LAG over a window
    whose partitions are nation-sized (≤ #years rows each, never fact
    rows — the aggregate runs FIRST, so the window shuffles a tiny
    frame). Growth ratio is one IEEE division of two exact-decimal-cast
    doubles — engine-identical.

    Join shape: the big-big orderkey shuffle (lineitem ⋈ orders), a
    custkey shuffle join for customer — a SCALE-PROPORTIONAL table,
    never broadcast-hinted: AQE may still broadcast it at small SF,
    but forcing it would OOM the driver at real scale — then one
    broadcast hop for the fixed-cardinality nation dim."""
    enriched = (
        lineitem.select("l_orderkey", REVENUE.alias("__rev"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    per_year = enriched.groupBy(
        "n_name", F.year("o_orderdate").alias("order_year")
    ).agg(dsum(F.col("__rev")).alias("revenue"))
    w = Window.partitionBy("n_name").orderBy("order_year")
    prev = F.lag("revenue").over(w)
    return per_year.select(
        "n_name",
        "order_year",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("delta"),
        (F.col("revenue") / prev).alias("growth_ratio"),
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1997-09-01",
    date_to: str = "1997-10-01",
) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): of one month's
    revenue, what percentage came from promo-typed parts. The month
    filter prunes the fact scan (pushed to parquet), the part dim
    broadcasts, and both the promo and total revenue fold decimal-
    exact in ONE aggregate — the share is a single IEEE division of
    two exact sums."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_partkey", REVENUE.alias("__rev"))
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("__rev")).otherwise(F.lit(0.0))
    return joined.agg(
        dsum(promo).alias("promo_revenue"),
        dsum(F.col("__rev")).alias("total_revenue"),
    ).select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


def order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customer engagement histogram (TPC-H Q13 shape): how many
    customers placed 0, 1, 2, … orders. Aggregate-FIRST: orders
    collapse to per-customer counts before touching the customer dim
    (the join moves #customers rows, not #orders), customers with no
    orders enter as count 0 via the left join, and the second
    aggregate is over #distinct-counts rows — tiny."""
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__n"))
    with_zero = (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"))
    )
    return (
        with_zero.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_orders"))
    )


def filtered_revenue(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    discount_center: float = 0.06,
    quantity_cap: float = 24.0,
) -> DataFrame:
    """Promotion what-if revenue (TPC-H Q6 shape): the revenue that a
    year's small-quantity, mid-discount line items contributed via
    their discount. The whole predicate — ship-date year, discount
    band, quantity cap — is a conjunctive scan filter, so every clause
    pushes down to the parquet reader and the aggregate sees only
    qualifying rows; there is NO join and NO shuffle beyond the 1-row
    partial→final fold. Discount bounds land exactly on the data's
    0.01 grid by building them in cents (integer ±1) rather than
    float-adding 0.01 — the band is closed [center−0.01, center+0.01]
    like the TPC-H text.

    Reference intent: the BI layer's single-table slicer queries over
    the pricing fact (SURVEY.md §3; reference mart ODS.py:59-80)."""
    cents = int(round(discount_center * 100))
    lo = F.lit((cents - 1) / 100.0)
    hi = F.lit((cents + 1) / 100.0)
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= lo)
        & (F.col("l_discount") <= hi)
        & (F.col("l_quantity") < F.lit(quantity_cap))
    )
    return filtered.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("promo_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "VIETNAM",
    nation_b: str = "BRAZIL",
) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): yearly revenue shipped
    between two named nations, in both directions — the cross-border
    flow report a commodity desk reads next to the COT panel.

    Plan: nation is a fixed-25-row dim, so BOTH nation hops broadcast
    and the two-name filter prunes each side to one row before the
    broadcast. supplier and customer are scale-proportional: they join
    on their own keys as shuffle joins (AQE may still broadcast at
    small SF). The only big-big shuffle is lineitem ⋈ orders on
    orderkey, and the supplier-nation semi filter lands on lineitem
    BEFORE that join, so the shuffle moves one nation's share of the
    fact. The (supp_nation ≠ cust_nation) residual keeps only the two
    cross directions; revenue folds decimal-exact per (pair, year)."""
    nat = nation.filter(F.col("n_name").isin([nation_a, nation_b])).select(
        "n_nationkey", "n_name"
    )
    supp = supplier.join(
        F.broadcast(nat.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(nat.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    li = lineitem.select(
        "l_orderkey", "l_suppkey", "l_shipdate", REVENUE.alias("__rev")
    ).join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    joined = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(dsum(F.col("__rev")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#1",
    max_size: int = 10,
    frac: float = 0.2,
) -> DataFrame:
    """Small-lot revenue probe (TPC-H Q17 shape): average yearly
    revenue lost if orders below 20% of a part's mean order quantity
    were not taken, over one brand/size slice of the catalog.

    Plan: the brand+size filter prunes the part dim FIRST and only the
    surviving keys broadcast into a semi-join on the fact — lineitem is
    never shuffled to discover which rows qualify. The per-part mean
    quantity and the threshold comparison then share ONE l_partkey
    exchange: the mean is a window AVG over the part's line items (the
    partition is part-sized, bounded by a part's order count, never
    corpus-sized), and the filter + global fold happen in the same
    stage. Means divide exact decimal sums, the final sum is decimal-
    exact, and /7.0 is one IEEE division — engine-identical."""
    keys = part.filter(
        (F.col("p_brand") == brand) & (F.col("p_size") <= F.lit(max_size))
    ).select("p_partkey")
    li = lineitem.join(
        F.broadcast(keys), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    qsum = F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(w)
    qcnt = F.count(F.lit(1)).over(w)
    avg_qty = (qsum.cast("double") / qcnt).cast("double")
    small = li.withColumn("__avg", avg_qty).filter(
        F.col("l_quantity") < F.lit(frac) * F.col("__avg")
    )
    return small.agg(
        (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lots"),
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_quantity: float = 212.0,
    topn: int = 20,
) -> DataFrame:
    """Bulk-buyer watchlist (TPC-H Q18 shape): orders whose total line
    quantity exceeds a threshold, with their customers, largest first.

    Plan: aggregate-FIRST — lineitem collapses to one row per order
    (decimal-exact quantity sum) and the HAVING filter drops ~all of
    them BEFORE any join, so the orderkey join moves only qualifying
    orders; the customer hop then joins on c_custkey (scale-
    proportional dim — shuffle join, AQE may broadcast at small SF).
    Top-N terminates in TakeOrderedAndProject; orderkey breaks ties
    deterministically."""
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(min_quantity))
    )
    joined = per_order.join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).join(
        customer.select("c_custkey", "c_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        joined.select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(topn)
    )


def bracketed_discount_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Bracketed promo revenue (TPC-H Q19 shape): revenue from three
    OR'd (brand, size-band, quantity-band) brackets — the disjunctive
    predicate that defeats naive pushdown. The part dim broadcasts
    with only (p_partkey, p_brand, p_size); the disjunction evaluates
    as a codegen'd filter AFTER the broadcast join (per-bracket
    quantity bands need the joined row), while the fact scan still
    prunes to the 3 columns the query touches. One decimal-exact fold.
    """
    li = lineitem.select("l_partkey", "l_quantity", REVENUE.alias("__rev"))
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bracket = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return joined.filter(bracket).agg(
        dsum(F.col("__rev")).alias("bracket_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def dormant_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    since: str = "2001-01-01",
) -> DataFrame:
    """Dormant-capital report (TPC-H Q22 shape): per nation, how many
    customers hold an above-average positive balance yet placed no
    order since ``since`` — the outreach list. The global mean
    positive balance is a 1-row aggregate broadcast back as a cross
    join (never a collect); dormancy is a left_anti against the
    date-filtered orders' key column only (the date clause pushes to
    the scan and the anti join shuffles surviving keys, not orders);
    the 25-row nation dim broadcasts. Balance totals fold decimal-
    exact."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("__avg_bal")
    )
    rich = customer.select("c_custkey", "c_nationkey", "c_acctbal").join(
        F.broadcast(avg_bal)
    ).filter(F.col("c_acctbal") > F.col("__avg_bal"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    dormant = rich.join(recent, "c_custkey", "left_anti")
    return (
        dormant.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            dsum("c_acctbal").alias("idle_balance"),
        )
        .orderBy("n_name")
    )


def basket_pairs(lineitem: DataFrame, topn: int = 20) -> DataFrame:
    """Market-basket co-occurrence: the part pairs most often ordered
    together — the "frequently bought together" panel.

    NO self-join: each order's distinct parts collapse to ONE sorted
    array (a single l_orderkey exchange), and the pairs are generated
    array-natively inside that row — transform × slice × flatten ×
    explode, all codegen — so the plan has two hash exchanges total
    (orderkey fold, pair count) where the naive self-join formulation
    costs four plus a corpus-sized join. Fan-out stays bounded by
    (lines per order)², a small constant; sort_array makes every pair
    (a < b)-ordered so each counts once; top-N terminates in
    TakeOrderedAndProject with a full lexical tiebreak."""
    parts = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("__ps")
    )
    ps = F.col("__ps")
    pair_lists = F.transform(
        ps,
        lambda x, i: F.transform(
            F.slice(ps, i + 2, F.greatest(F.size(ps) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
        ),
    )
    return (
        parts.select(F.explode(F.flatten(pair_lists)).alias("__p"))
        .select(F.col("__p.part_a").alias("part_a"), F.col("__p.part_b").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(topn)
    )


def market_concentration(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Supplier concentration per nation (Herfindahl–Hirschman index):
    HHI = Σᵢ shareᵢ² over each nation's supplier revenue shares — the
    antitrust-style market-structure read on the supply side.

    Engine-exact without ever materializing a share: HHI =
    (Σ revᵢ²) / (Σ revᵢ)², where per-supplier revenue folds
    decimal-exact and is then narrowed to DECIMAL(18,6) — the SAME
    scale, so the narrowing is a pure precision assertion with no
    rounding (a scale-changing recast would tie on trailing ..50
    digits ~1% of the time and split HALF_UP vs HALF_EVEN across
    engines). revᵢ² then stays inside both engines' 38-digit cap with
    scale 12 intact, sums are exact, and the final division is one
    IEEE op on two exactly-summed casts. Aggregate-first: the fact
    collapses to one row per supplier before the supplier dim join."""
    per_supp = (
        lineitem.groupBy("l_suppkey")
        .agg(F.sum(REVENUE.cast("decimal(38,6)")).alias("__r38"))
        .select("l_suppkey", F.col("__r38").cast("decimal(18,6)").alias("rev"))
    )
    joined = per_supp.join(
        supplier.select("s_suppkey", "s_nationkey"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    per_nation = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev").alias("__tot"),
        F.sum(F.col("rev") * F.col("rev")).alias("__sumsq"),
    )
    tot_d = F.col("__tot").cast("double")
    return per_nation.select(
        "n_name",
        "n_suppliers",
        tot_d.alias("total_revenue"),
        (F.col("__sumsq").cast("double") / (tot_d * tot_d)).alias("hhi"),
    ).orderBy("n_name")


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "red",
    cost_factor: float = 0.9,
) -> DataFrame:
    """Product-line profit by supplier nation and year (TPC-H Q9
    shape; the testdata has no partsupp, so unit cost proxies as
    ``cost_factor`` × p_retailprice — same join/aggregate skeleton):
    profit = Σ (revenue − cost·quantity) over parts whose name carries
    ``name_token``.

    Plan: the name filter prunes part FIRST and the surviving keys
    broadcast into a semi-join on lineitem — the fact never shuffles
    to discover qualifying rows; the retail-price lookup joins the
    SAME pruned part frame on partkey (scale-proportional dim: shuffle
    join, AQE may broadcast at small SF); then the one big-big
    orderkey shuffle for the year, a suppkey join, and the fixed-25-row
    nation broadcast. Per-row profit is an IEEE product chain cast to
    DECIMAL(38,6) before the fold — order-independent totals."""
    keys = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    li = lineitem.join(
        keys.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    profit_row = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(keys, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit_row).alias("profit"))
        .orderBy("n_name", F.col("o_year"))
    )


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 60,
    topn: int = 20,
) -> DataFrame:
    """Suppliers who single-handedly held up finished multi-supplier
    orders (TPC-H Q21 shape; the testdata has no receipt/commit dates,
    so "late" is the same ship-lag predicate q_shipmode_priority pins:
    shipped > ``late_days`` after the order date). An order blames a
    supplier when it used >1 supplier but exactly ONE of them was late.

    Plan: Q21's EXISTS / NOT EXISTS pair decorrelates into ONE
    per-order aggregate — the lineitem⋈orders('F') big-big join on
    orderkey carries the lateness flag, then a single orderkey
    aggregate folds the supplier census (distinct suppliers, distinct
    late suppliers, and — valid exactly when that count is 1 — the
    blamed suppkey via MAX over the late subset). No self-join of
    lineitem against itself, which is the naive Q21 plan and shuffles
    the fact twice. Blame counts then aggregate supplier-sized rows;
    the name lookup joins supplier AFTER the fold (scale-proportional
    dim; AQE may broadcast at small SF); top-N terminates in
    TakeOrderedAndProject with suppkey as tiebreaker."""
    fo = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {late_days} DAYS"
    )
    per_order = (
        li.join(fo, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("__n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("__blame"),
        )
    )
    counts = (
        per_order.filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
        .groupBy("__blame")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        counts.join(
            supplier.select("s_suppkey", "s_name"),
            F.col("__blame") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(topn)
    )


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    max_size: int = 15,
    topn: int = 100,
) -> DataFrame:
    """Cheapest regional supplier per small part (TPC-H Q2 shape; no
    partsupp in the testdata, so the supply cost of a (part, supplier)
    pair is the best observed unit price min(l_extendedprice /
    l_quantity) in lineitem). Q2's correlated MIN subquery decorrelates
    into a rank-1 window.

    Plan: region⋈nation collapses to a ≤25-row nation keylist that
    broadcasts into the supplier dim; the (part, supplier) cost table
    folds in ONE (l_partkey, l_suppkey) aggregate over the fact; the
    per-part argmin is ROW_NUMBER over partitions bounded by a part's
    supplier count — never corpus-sized — with (cost, suppkey) ordering
    so ties are deterministic. The part-attribute lookup joins the
    pruned size slice (scale-proportional dim; AQE may broadcast);
    unit-price division and its MIN are single IEEE ops, bit-identical
    across engines. Top-N by account balance terminates in
    TakeOrderedAndProject; p_partkey (unique per output row) breaks
    balance ties."""
    nk = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    regional = supplier.join(
        F.broadcast(nk), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    cost = (
        lineitem.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    ranked = cost.join(regional, F.col("l_suppkey") == F.col("s_suppkey")).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("l_partkey").orderBy("unit_cost", "s_suppkey")
        ),
    )
    small = part.filter(F.col("p_size") <= max_size).select(
        "p_partkey", "p_brand"
    )
    return (
        ranked.filter(F.col("__rn") == 1)
        .join(small, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(topn)
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    frac: float = 0.001,
) -> DataFrame:
    """Parts holding an outsized share of one nation's traded value
    (TPC-H Q11 shape; partsupp value proxied by the nation's lineitem
    turnover per part). Q11's scalar HAVING subquery decorrelates into
    a 1-row broadcast.

    Plan: the single-nation key broadcasts into supplier, whose
    surviving keys semi-join the fact on suppkey (scale-proportional
    subset — a shuffle semi-join at 100 TB, AQE may broadcast at small
    SF); per-part value folds decimal-exact in one partial→final
    aggregate; the global total is a second fold of the SAME decimal
    per-part values — 1 row, broadcast back, so the threshold
    comparison is map-side and no window ever sees an unpartitioned
    frame. The one IEEE step is frac × total; both operands
    bit-identical across engines."""
    nkey = nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
    skeys = supplier.join(
        F.broadcast(nkey), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = lineitem.join(
        skeys, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("__value")
    )
    per_part = scoped_persist(per_part)
    total = per_part.agg(
        F.sum("__value").cast("double").alias("__total")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__value").cast("double") > F.lit(frac) * F.col("__total"))
        .select(
            "l_partkey", F.col("__value").cast("double").alias("stock_value")
        )
        .orderBy(F.col("stock_value").desc(), "l_partkey")
    )


def supplier_diversity(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#5",
    excl_type_prefix: str = "PROMO",
) -> DataFrame:
    """Distinct-supplier census per part segment, excluding one brand,
    one type family, and blacklisted suppliers (TPC-H Q16 shape; the
    supplier⟷part relation is the observed distinct (l_partkey,
    l_suppkey) pairs — no partsupp — and "customer complaints" proxies
    as a negative account balance).

    Plan: Q16's NOT IN subquery decorrelates into a left-anti join on
    the blacklist (scale-proportional subset; AQE may broadcast at
    small SF). Pair distinct folds at (partkey, suppkey) granularity
    FIRST — map-side combine collapses a part-supplier's many line
    items before the shuffle — then the pruned part slice joins on
    partkey and COUNT(DISTINCT suppkey) folds per (brand, type, size).
    Two key-partitioned shuffles total, both on pre-collapsed rows;
    nothing corpus-sized crosses unaggregated."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    clean = pairs.join(
        bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    seg = part.filter(
        (F.col("p_brand") != excl_brand)
        & (~F.col("p_type").startswith(excl_type_prefix))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        clean.join(seg, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def promotion_candidates(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "blue",
    year: int = 1997,
    nation_name: str = "NATION_1",
) -> DataFrame:
    """Suppliers of one nation with surplus stock of a part family
    (TPC-H Q20 shape; availqty has no partsupp source, so a supplier
    qualifies when, for some ``name_token`` part, its ``year``
    shipments exceed half its all-time shipments of that part — the
    same "excess inventory" signal Q20's 0.5×qty threshold probes).

    Plan: Q20's three nested subqueries decorrelate into one
    conditional aggregate — the name-filtered part keys broadcast-semi
    onto the fact BEFORE any shuffle, then per (partkey, suppkey) the
    year slice and the all-time total fold in the SAME decimal-exact
    aggregate (no second pass over the fact); the surplus filter
    compares 2×year against total in exact decimals (no division);
    qualifying suppkeys collapse via semi-join into the supplier dim,
    pruned by the 1-nation broadcast. The fact is scanned once."""
    keys = part.filter(F.col("p_name").contains(name_token)).select("p_partkey")
    li = lineitem.join(
        F.broadcast(keys), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    qty = F.col("l_quantity").cast("decimal(38,6)")
    in_year = F.year("l_shipdate") == year
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in_year, qty).otherwise(F.lit(0).cast("decimal(38,6)"))).alias(
            "__q_year"
        ),
        F.sum(qty).alias("__q_total"),
    )
    surplus = per_pair.filter(
        (F.col("__q_year") > 0) & (F.col("__q_year") * 2 > F.col("__q_total"))
    ).select("l_suppkey")
    nkey = nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
    return (
        supplier.join(
            F.broadcast(nkey), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(surplus, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


def event_path_trigrams(events: DataFrame, gap_minutes: int = 30, topn: int = 50) -> DataFrame:
    """Clickstream path mining: the top-``topn`` 3-step event-type
    paths users take WITHIN a session — sessionize (lag + conditional
    cumsum, ``windows.sessionize``), then two LEADs build each row's
    forward trigram and a map-side-combinable count ends in
    TakeOrderedAndProject. The funnel family (a_funnel_steps) asks "did
    the fixed path happen"; this asks the inverse — "which paths
    happen", the query that DISCOVERS the funnels worth defining.

    Shape: both window specs (session assignment, forward leads) key
    by user, so the corpus shuffles once on user_id; trigram
    concatenation is NULL-propagating (last two rows of a session emit
    no path) — no explode, no self-join, path cardinality bounded by
    |event_types|³.
    """
    from ..operators.windows import sessionize

    sess = sessionize(events, gap_minutes)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    path = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(w),
        F.lead("event_type", 2).over(w),
    )
    # concat_ws skips NULLs rather than propagating: guard explicitly
    full = (
        F.lead("event_type", 2).over(w).isNotNull()
        & F.lead("event_type", 1).over(w).isNotNull()
    )
    return (
        sess.select(F.when(full, path).alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(topn)
    )


def receivables_aging(
    customer: DataFrame,
    orders: DataFrame,
    as_of: str = "1998-08-01",
) -> DataFrame:
    """Receivables aging report — the finance-desk staple the
    reference's warehouse consumer would run next: open (non-finished)
    order value per market segment bucketed by age against an as-of
    date (current / 31-60 / 61-90 / 90+ days).

    Shape: orders pre-filter (status <> 'F') BEFORE the broadcast
    customer join — the fact shuffle carries only open orders; the
    aging bucket is a pure projection (datediff + CASE); one grouped
    decimal-exact sum ends it. Buckets are labeled with a sort prefix
    so the report orders stably without a custom collation.
    """
    age = F.datediff(F.to_date(F.lit(as_of)), F.col("o_orderdate"))
    bucket = (
        F.when(age <= 30, "1:0-30")
        .when(age <= 60, "2:31-60")
        .when(age <= 90, "3:61-90")
        .otherwise("4:90+")
    )
    open_orders = orders.filter(F.col("o_orderstatus") != "F").select(
        "o_custkey", "o_totalprice", bucket.alias("age_bucket")
    )
    return (
        open_orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("open_value"),
        )
    )


def seasonal_index(orders: DataFrame) -> DataFrame:
    """Monthly seasonality index of order revenue: month revenue ÷
    (year total / 12) — the deseasonalization factor a commodity desk
    applies before comparing months (harvest cycles make raw
    month-over-month meaningless; SURVEY §0's seasonal Season token is
    the same concern at ingest).

    Two decimal-exact aggregates from the same base (month level and
    year level — the year side re-aggregates from orders rather than
    from the month frame so both stay order-independent decimal
    folds), broadcast-joined on year; the index is one fixed double
    expression over the exact sums. Months with a zero year total
    cannot occur (a year present has revenue), so no guard division.
    """
    ym = orders.select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        "o_totalprice",
    )
    monthly = ym.groupBy("yr", "mo").agg(
        dsum("o_totalprice").alias("month_rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    yearly = ym.groupBy("yr").agg(dsum("o_totalprice").alias("year_rev"))
    return monthly.join(F.broadcast(yearly), "yr").select(
        "yr",
        "mo",
        "n_orders",
        "month_rev",
        (F.col("month_rev") * F.lit(12.0) / F.col("year_rev")).alias(
            "seasonal_index"
        ),
    )


def association_rules(lineitem: DataFrame, topn: int = 20) -> DataFrame:
    """Association rules over order baskets — support, confidence and
    lift for the strongest part pairs (the step after ``basket_pairs``
    that turns co-occurrence counts into actionable "X implies Y"
    rules, Agrawal-style without the multi-level Apriori tail).

    Same array-native pair generation (no self-join), one extra tiny
    aggregate for per-part basket counts (broadcast both ways onto the
    pair frame) and a 1-row basket total. All three metrics are
    ratios of exact BIGINT counts — single fixed double divisions —
    and the rule ranking is by lift with a full lexical tiebreak into
    TakeOrderedAndProject.
    """
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("__ps")
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("__n"))
    item_counts = (
        baskets.select(F.explode("__ps").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("c_item"))
    )
    ps = F.col("__ps")
    pair_lists = F.transform(
        ps,
        lambda x, i: F.transform(
            F.slice(ps, i + 2, F.greatest(F.size(ps) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
        ),
    )
    pairs = (
        baskets.select(F.explode(F.flatten(pair_lists)).alias("__p"))
        .select(
            F.col("__p.part_a").alias("part_a"),
            F.col("__p.part_b").alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ca = item_counts.select(
        F.col("part").alias("part_a"), F.col("c_item").alias("c_a")
    )
    cb = item_counts.select(
        F.col("part").alias("part_b"), F.col("c_item").alias("c_b")
    )
    out = (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            (F.col("c_ab") / F.col("__n")).alias("support"),
            (F.col("c_ab") / F.col("c_a")).alias("confidence"),
            (
                (F.col("c_ab") * F.col("__n")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("lift").desc(), "part_a", "part_b"
    ).limit(topn)


def customer_migration(orders: DataFrame) -> DataFrame:
    """Year-over-year customer tier migration: customers quartiled by
    yearly revenue (NTILE 4, deterministic revenue-then-key order),
    then counted per (year, tier → next-year tier) transition with
    churn (absent next year) as tier 0 — the retention-economics view
    a commercial team plans against.

    Shapes: one decimal-exact (year, customer) rollup; quartiles are a
    year-partitioned window (years are few, customers per year many —
    partitions stay balanced); the self-join on (customer, year+1) is
    key-equality on the SMALL yearly frame, not on orders. The final
    year emits no row (no next year to migrate into).
    """
    yearly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.col("o_custkey")
    ).agg(dsum("o_totalprice").alias("rev"))
    w = Window.partitionBy("yr").orderBy(F.desc("rev"), "o_custkey")
    tiers = yearly.select(
        "yr", "o_custkey", F.ntile(4).over(w).alias("tier")
    )
    nxt = tiers.select(
        (F.col("yr") - 1).alias("yr"),
        "o_custkey",
        F.col("tier").alias("next_tier"),
    )
    max_yr = tiers.agg(F.max("yr").alias("__max_yr"))
    return (
        tiers.join(nxt, ["yr", "o_custkey"], "left")
        .crossJoin(F.broadcast(max_yr))
        .filter(F.col("yr") < F.col("__max_yr"))
        .groupBy("yr", "tier", F.coalesce("next_tier", F.lit(0)).alias("next_tier"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def duplicate_payments(
    orders: DataFrame,
    window_days: int = 30,
    amount_tol_cents: int = 100_000,
) -> DataFrame:
    """Near-duplicate payment audit: pairs of orders from the SAME
    customer with amounts within ``amount_tol_cents`` and dates within
    ``window_days`` — the accounts-payable double-charge screen (real
    double-pays rarely match to the cent once fees differ, so the
    screen bands the amount).

    Equality-keyed self-join on (custkey, amount band) — the same
    pigeonhole trick as the Hamming joins (dedup.py simhash_pairs):
    band = floor(cents / tol), so any in-tolerance pair lands in
    adjacent bands; the probe side explodes to {band-1, band, band+1}
    and the equi-join on the band makes each candidate pair meet in
    EXACTLY one band-pair (the build row's own band), so exactness and
    pair uniqueness are free — the ±tol filter stays as a post-join
    predicate. Without the band, a power-law mega-customer is Σn²
    inside one task; with it, that customer's pair stream splits
    across its occupied amount bands. Deduped by id order; dates
    surface as strings.
    """
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    side = orders.select(
        "o_orderkey", "o_custkey", cents.alias("__c"), "o_orderdate"
    )
    band = F.floor(F.col("__c") / F.lit(amount_tol_cents))
    a = side.select(
        F.col("o_orderkey").alias("order_a"),
        "o_custkey",
        F.col("__c").alias("c_a"),
        F.col("o_orderdate").alias("date_a"),
        F.explode(
            F.array(band - 1, band, band + 1)
        ).alias("band"),
    )
    b = side.select(
        F.col("o_orderkey").alias("order_b"),
        "o_custkey",
        F.col("__c").alias("c_b"),
        F.col("o_orderdate").alias("date_b"),
        band.alias("band"),
    )
    return (
        a.join(b, ["o_custkey", "band"])
        .filter(
            (F.col("order_a") < F.col("order_b"))
            & (F.abs(F.col("c_a") - F.col("c_b")) <= amount_tol_cents)
            & (F.abs(F.datediff("date_a", "date_b")) <= window_days)
        )
        .select(
            "o_custkey",
            "order_a",
            "order_b",
            (F.abs(F.col("c_a") - F.col("c_b")) / F.lit(100.0)).alias(
                "amount_diff"
            ),
            F.date_format("date_a", "yyyy-MM-dd").alias("date_a"),
            F.date_format("date_b", "yyyy-MM-dd").alias("date_b"),
            F.abs(F.datediff("date_a", "date_b")).cast("int").alias(
                "days_apart"
            ),
        )
    )


def supplier_scorecard(
    supplier: DataFrame, lineitem: DataFrame, topn: int = 25
) -> DataFrame:
    """Multi-metric supplier scorecard via Borda rank aggregation:
    revenue, shipped volume, and average discount (lower = better
    margin discipline) each rank independently, the composite is the
    rank SUM, and the final ordering is by composite — the standard
    way to combine incommensurable KPIs without inventing weights.

    Exact: metrics are decimal folds; ranks are dense integers under
    deterministic (metric, key) orders; the composite is a small
    integer. One fact aggregate keyed by supplier, three window ranks
    over the supplier-cardinality frame, top-N out.
    """
    m = lineitem.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "revenue"
        ),
        dsum("l_quantity").alias("volume"),
        davg("l_discount").alias("avg_disc"),
    )
    w_rev = Window.orderBy(F.desc("revenue"), "l_suppkey")
    w_vol = Window.orderBy(F.desc("volume"), "l_suppkey")
    w_dis = Window.orderBy(F.asc("avg_disc"), "l_suppkey")
    ranked = (
        m.withColumn("rk_revenue", F.row_number().over(w_rev))
        .withColumn("rk_volume", F.row_number().over(w_vol))
        .withColumn("rk_discount", F.row_number().over(w_dis))
    )
    composite = (
        F.col("rk_revenue") + F.col("rk_volume") + F.col("rk_discount")
    )
    out = (
        ranked.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "l_suppkey",
            "s_name",
            "revenue",
            "volume",
            "avg_disc",
            "rk_revenue",
            "rk_volume",
            "rk_discount",
            composite.alias("borda_score"),
        )
    )
    return out.orderBy("borda_score", "l_suppkey").limit(topn)


def order_backlog(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Open-order backlog curve: for every calendar day, orders placed
    to date minus orders FULLY shipped to date (an order ships when its
    last line item does) — the operations metric behind lead-time and
    capacity planning.

    Shapes: both event streams collapse to per-day counts first
    (map-side combinable; the "shipped" stream needs one per-order max
    before its daily count), the calendar unions the two day sets, and
    the two running sums ride ONE window over the CALENDAR-bounded
    frame (days since epoch — a few thousand rows regardless of fact
    size, the same bounded-frame argument as the KS tick lattice).
    """
    placed = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_placed"))
    shipped = (
        lineitem.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__done"))
        .groupBy(F.date_format("__done", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    daily = placed.join(shipped, "day", "full").select(
        "day",
        F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
        F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_placed",
        "n_shipped",
        F.sum("n_placed").over(w).alias("cum_placed"),
        F.sum("n_shipped").over(w).alias("cum_shipped"),
        (F.sum("n_placed").over(w) - F.sum("n_shipped").over(w)).alias(
            "backlog"
        ),
    )


def gini_concentration(orders: DataFrame) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    single-number inequality gauge behind the Pareto/ABC views: one
    row (n_customers, total_cents, gini) with G = (2·Σ i·x_i −
    (n+1)·Σx) / (n·Σx) over ascending-sorted per-customer revenue.

    Exact: revenues fold as integer CENTS per customer (BIGINT, no
    decimal→double tie risk), ranks come from one window over the
    CUSTOMER-cardinality frame (dimension-sized — the supplier-
    scorecard argument; at extreme customer counts swap in the
    bucketed prefix-sum numbering), and every sum in the formula is a
    BIGINT; the division happens once.
    """
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("__x"))
    w = Window.orderBy(F.asc("__x"), F.asc("o_custkey"))
    ranked = per_cust.withColumn("__i", F.row_number().over(w).cast("long"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("__x").alias("total_cents"),
        (
            (
                2 * F.sum(F.col("__i") * F.col("__x"))
                - (F.count(F.lit(1)) + 1) * F.sum("__x")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("__x")).cast("double")
        ).alias("gini"),
    )


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    YEAR, cumulative revenue per customer tracked by years-since-first
    — the LTV view that prices acquisition (retention counts say who
    stayed; this says what they were worth).

    Shapes: first-order year is one min aggregate per customer
    (broadcast back — customer-cardinality); revenue rolls up per
    (cohort, age) with decimal-exact sums; the cumulative curve rides
    a window partitioned by cohort over the ≤ years² frame. Output:
    (cohort_year, age_years, n_customers, rev, cum_rev_per_customer).
    """
    first = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    j = orders.join(F.broadcast(first), "o_custkey").select(
        "o_custkey",
        "cohort_year",
        (F.year("o_orderdate") - F.col("cohort_year")).alias("age_years"),
        "o_totalprice",
    )
    cohort_sizes = first.groupBy("cohort_year").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    # the cumulative stays DECIMAL through the window (a double running
    # sum would hit DuckDB's segment-tree association order), cast once
    # on the way out
    per_age = j.groupBy("cohort_year", "age_years").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("__rev_d")
    )
    w = (
        Window.partitionBy("cohort_year")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_age.join(F.broadcast(cohort_sizes), "cohort_year")
        .select(
            "cohort_year",
            "age_years",
            "n_customers",
            F.col("__rev_d").cast("double").alias("rev"),
            (
                F.sum("__rev_d").over(w).cast("double")
                / F.col("n_customers")
            ).alias("cum_rev_per_customer"),
        )
    )


def _global_ntile_rank(
    df: DataFrame,
    metric_col: str,
    tiebreak_col: str,
    out_col: str,
    ascending: bool,
    n_buckets: int = 64,
) -> DataFrame:
    """Global 1-based row rank under (metric, tiebreak) total order —
    the distributed pareto/global_row_numbers shape (NEVER an
    empty-``partitionBy()`` window): rows bucket by deterministic
    value ranges of the metric (width_bucket over broadcast min/max —
    a pure function of the value, so equal metrics always share a
    bucket and ties never straddle a boundary), each bucket ranks
    under its own window (ONE corpus exchange), and cross-bucket
    offsets come from the tiny per-bucket counts broadcast back."""
    m_dbl = F.col(metric_col).cast("double")
    stats = df.agg(F.min(m_dbl).alias("__lo"), F.max(m_dbl).alias("__hi"))
    bucket = F.when(F.col("__lo") == F.col("__hi"), F.lit(1)).otherwise(
        F.least(
            F.lit(n_buckets),
            F.width_bucket(m_dbl, F.col("__lo"), F.col("__hi"), F.lit(n_buckets)),
        )
    )
    bucketed = scoped_persist(
        df.crossJoin(F.broadcast(stats)).withColumn("__b", bucket)
    )
    metric_order = (
        F.asc(metric_col) if ascending else F.desc(metric_col)
    )
    w_in = Window.partitionBy("__b").orderBy(metric_order, F.asc(tiebreak_col))
    # offsets: count of rows in buckets that sort BEFORE this one under
    # the requested direction (bucket ids rise with the metric value)
    w_off = Window.orderBy(
        F.asc("__b") if ascending else F.desc("__b")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        bucketed.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        )
        .select("__b", "__off")
    )
    return bucketed.join(F.broadcast(offs), "__b").select(
        *df.columns,
        (F.col("__off") + F.row_number().over(w_in)).alias(out_col),
    )


def _ntile_from_rank(rank_col: str, n_col: str, k: int):
    """Exact NTILE(k) tile from a 1-based global rank and total count
    — SQL-standard fill (the first ``n mod k`` tiles get the extra
    row), all-integer arithmetic so both engines agree bit-for-bit."""
    r = F.col(rank_col)
    n = F.col(n_col)
    q = F.floor(n / k)  # base tile size
    rem = n - q * k  # tiles 1..rem carry q+1 rows
    big_span = (q + 1) * rem
    in_big = F.floor((r - 1) / (q + 1)) + 1
    in_small = rem + F.floor((r - 1 - big_span) / F.greatest(q, F.lit(1))) + 1
    return F.when(r <= big_span, in_big).otherwise(in_small)


def rfm_segments(orders: DataFrame, k: int = 5) -> DataFrame:
    """RFM customer segmentation — the classic CRM cut (recency of
    last order, order frequency, monetary value) scored into exact
    NTILE-``k`` quintiles; the reference's customer dimension
    (ODS.py:19-56) exists to serve exactly this class of rollup.

    Semantics: recency is whole days between the customer's last
    order and the corpus-wide anchor (max order date — derived, not
    wall-clock, so reruns are reproducible); frequency is the order
    count; monetary accumulates DECIMAL(38,6) (order-independent).
    Scores are SQL-standard NTILE over deterministic total orders
    (metric, then custkey) — r ascending (1 = most recent), f and m
    descending (1 = heaviest) — computed WITHOUT the global-sort
    NTILE window: three bucketed distributed ranks (pareto prefix-sum
    shape, one customer-cardinality exchange each) feed an
    all-integer tile formula, so the plan never funnels the customer
    universe through one task.

    Output: (o_custkey, recency_days, frequency, monetary, r_score,
    f_score, m_score, rfm_cell) with rfm_cell = r·100 + f·10 + m."""
    anchor = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("__anchor")
    )
    per_cust = scoped_persist(
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias(
                "__monetary_d"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("__anchor", "__last").cast("int").alias("recency_days"),
            "frequency",
            "__monetary_d",
        )
    )
    n_total = per_cust.agg(F.count(F.lit(1)).alias("__n"))
    ranked = _global_ntile_rank(
        per_cust, "recency_days", "o_custkey", "__rr", ascending=True
    )
    ranked = _global_ntile_rank(
        ranked, "frequency", "o_custkey", "__rf", ascending=False
    )
    ranked = _global_ntile_rank(
        ranked, "__monetary_d", "o_custkey", "__rm", ascending=False
    )
    scored = ranked.crossJoin(F.broadcast(n_total)).select(
        "o_custkey",
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("__monetary_d").cast("double").alias("monetary"),
        _ntile_from_rank("__rr", "__n", k).cast("int").alias("r_score"),
        _ntile_from_rank("__rf", "__n", k).cast("int").alias("f_score"),
        _ntile_from_rank("__rm", "__n", k).cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_cell",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int"),
    )
