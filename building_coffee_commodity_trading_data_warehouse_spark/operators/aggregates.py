"""Aggregation surface (SURVEY.md §2.4) plus the OLAP extensions the
star schema invites (rollup, approx-distinct).

Reference semantics:
  A1  global count (row-count reconciliation, STG.py:86,97-100)
  A3  grouped sums over players (the COT goldens)
  A4  grouped max-min spread (Spead.csv)
  A5  vertical concat + re-aggregate (STG.py:304)

All double sums/averages go through decimal-exact accumulation
(functions/exact.py): order-independent, so results are identical under
any partitioning — locally and on a 1000-executor cluster. Grouped
aggregation is one hash shuffle with map-side partial aggregation
(Spark does partial_sum before the exchange automatically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import davg, dsum


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregate: the A1/A3 sum/avg/count
    battery over returnflag × linestatus."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def minmax_spread(lineitem: DataFrame) -> DataFrame:
    """A4 (Spead.csv semantics): per day, max(price) - min(price)
    across the traded series. min/max of doubles pick existing values —
    exact on any engine, no decimal needed."""
    return (
        lineitem.groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"))
        .agg(
            (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("spread_max_min"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


def union_then_aggregate(orders_slices: list[DataFrame]) -> DataFrame:
    """A5 + §2.7: unionByName of N slices, then grouped count/sum —
    the pd.concat → aggregate shape of the PDF-table pipeline."""
    from .joins import union_all_by_name

    unioned = union_all_by_name(orders_slices)
    return unioned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_total"),
    )


def rollup_status_priority(orders: DataFrame) -> DataFrame:
    """Rollup over status → priority with subtotal rows labeled 'ALL'
    (additive OLAP capability, SURVEY.md §2.4 note)."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
    )


def distinct_counts(lineitem: DataFrame) -> DataFrame:
    """Exact + approximate distinct: count_distinct shuffles the keys,
    approx_count_distinct (HyperLogLog++) is one pass, no key shuffle —
    the 100 TB default for cardinality questions."""
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )


def global_counts(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """A1/A2: global counts + all-null column probe as a 1-row frame —
    the audit reconciliation numbers (STG.py:97-100, 133-164)."""
    li = lineitem.agg(
        F.count(F.lit(1)).alias("lineitem_rows"),
        F.count("l_quantity").alias("lineitem_qty_nonnull"),
    )
    od = orders.agg(F.count(F.lit(1)).alias("orders_rows"))
    return li.crossJoin(od)


def quantity_percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact linear-interpolation percentiles (ANSI PERCENTILE_CONT
    semantics) per group. Exact percentile sorts every group member —
    fine per-group here; at 100 TB prefer approx_percentile (t-digest
    sketch, one pass, mergeable) and keep exact for audits. Quartile
    positions are exact binary fractions, so interpolated values are
    bit-identical across engines."""
    return lineitem.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("q_min"),
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.max("l_quantity").alias("q_max"),
        F.count("l_quantity").alias("n_rows"),
    )


def quantity_percentiles_approx(
    lineitem: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """The 100 TB path for quantity_percentiles: approx_percentile's
    mergeable one-pass sketch (map-side partial aggregation, bounded
    state per group) instead of the exact formulation's full per-group
    sort. Error is bounded by 1/accuracy of rank; min/max/count stay
    exact. Sketch internals differ across engines, so the driver gate
    is rows-only; the exact-vs-approx error bound is pinned in
    tests/test_oracle_parity.py."""
    return lineitem.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("q_min"),
        F.approx_percentile("l_quantity", 0.25, accuracy).alias("q25"),
        F.approx_percentile("l_quantity", 0.5, accuracy).alias("q50"),
        F.approx_percentile("l_quantity", 0.75, accuracy).alias("q75"),
        F.max("l_quantity").alias("q_max"),
        F.count("l_quantity").alias("n_rows"),
    )


def pivot_value_by_type(
    events: DataFrame, types: list[str] | None = None
) -> DataFrame:
    """Long-to-wide pivot with exact sums — the shape of the
    reference's per-player COT goldens (one column per player). An
    EXPLICIT value list keeps the plan single-pass (no distinct-values
    pre-scan) and the output schema stable at 100 TB; each cell is a
    map-side-combinable decimal sum."""
    types = types or ["click", "view", "purchase", "signup", "error"]
    return events.groupBy("user_id").pivot("event_type", types).agg(dsum("value"))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, per
    (cohort_week, active_week) distinct-user counts — the classic
    product-analytics rollup. Two hash aggregations on user_id (both
    map-side combinable) and one join; no window, no driver data."""
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    first = (
        events.select("user_id", week.alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    active = events.select("user_id", week.alias("active_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def funnel_steps(events: DataFrame) -> DataFrame:
    """Ordered funnel: users whose first signup precedes their first
    click precedes their first purchase. Conditional-min aggregation
    per user (one shuffle), then a single global count row — the
    sequence test runs as plain column comparisons, no UDF, no
    self-join per step."""
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return firsts.agg(
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "n_signup_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


def grouped_partials(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Mergeable partial aggregate for incremental view maintenance:
    per-key (count, decimal sum). Keeping the sum in DECIMAL(38,6)
    (exact, associative) is what makes the partials MERGEABLE —
    re-aggregating partials gives bit-identical results to a full
    re-scan, under any split of the input."""
    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_value_dec"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Incremental materialized-view refresh: merge per-key partials
    (base snapshot + delta batches) into the full aggregate WITHOUT
    re-scanning the base — the 100 TB refresh path (re-aggregate the
    tiny delta, merge with the stored partial; cost scales with the
    delta, not the table).

    Equivalent to a full group-by over the union of the inputs because
    count and decimal-sum are commutative monoids."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), partials)
    key_cols = [c for c in merged.columns if c not in ("n_events", "sum_value_dec")]
    return (
        merged.groupBy(*key_cols)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").alias("sum_value_dec"),
        )
        .select(
            *key_cols,
            F.col("n_events"),
            F.col("sum_value_dec").cast("double").alias("total_value"),
        )
    )


def variance_stats(lineitem: DataFrame) -> DataFrame:
    """Exact-moment dispersion per group: variance/stddev from decimal
    Σx and Σx² (each order-independent), combined in double with a
    FIXED expression tree — deterministic on any engine and any
    partitioning, unlike native var_pop over doubles (whose partial
    merges are order-sensitive at the last bit)."""
    x = F.col("l_quantity")
    sx = F.sum(x.cast("decimal(38,6)")).cast("double")
    sx2 = F.sum((x * x).cast("decimal(38,6)")).cast("double")
    n = F.count(F.lit(1))
    mean = sx / n
    var = sx2 / n - (sx / n) * (sx / n)
    return lineitem.groupBy("l_returnflag").agg(
        n.alias("n_rows"),
        mean.alias("mean_qty"),
        var.alias("var_pop_qty"),
        F.sqrt(var).alias("stddev_pop_qty"),
    )


def distinct_counts_approx(lineitem: DataFrame, rsd: float = 0.01) -> DataFrame:
    """The 100 TB distinct-count path: HyperLogLog++ sketches
    (approx_count_distinct) — mergeable, bounded memory, one map-side-
    combinable pass; the exact twin (distinct_counts) needs a full
    distinct shuffle per column. Sketch output is engine-specific, so
    the driver gate is rows-only; the error bound vs exact is pinned
    in tests."""
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd).alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey", rsd).alias("n_supps_approx"),
        F.approx_count_distinct("l_orderkey", rsd).alias("n_orders_approx"),
    )


def distinct_counts_certified(lineitem: DataFrame, rsd: float = 0.01) -> DataFrame:
    """HLL++ sketches CERTIFIED against the exact counts in one result:
    per group, the exact distinct counts (value-portable) plus a
    boolean per column asserting the sketch landed within 3·rsd of
    exact (the standard ±3σ bound, floored at an absolute 3 for tiny
    groups). The approx values themselves are engine-specific and are
    deliberately NOT in the output — the booleans are, so a
    cross-engine value check also proves the sketch bound.

    Cost note: this is the VERIFICATION query (exact + sketch in one
    pass, the exact side paying the distinct expand); production code
    wanting only estimates uses distinct_counts_approx."""
    ag = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("__ap"),
        F.approx_count_distinct("l_suppkey", rsd).alias("__as"),
        F.approx_count_distinct("l_orderkey", rsd).alias("__ao"),
    )

    def ok(approx: str, exact: str) -> Column:
        bound = F.greatest(F.lit(3.0), F.lit(3.0 * rsd) * F.col(exact))
        return F.abs(F.col(approx) - F.col(exact)) <= bound

    return ag.select(
        "l_returnflag",
        "n_parts",
        "n_supps",
        "n_orders",
        ok("__ap", "n_parts").alias("parts_ok"),
        ok("__as", "n_supps").alias("supps_ok"),
        ok("__ao", "n_orders").alias("orders_ok"),
    )


def quantity_percentiles_certified(
    lineitem: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """approx_percentile CERTIFIED by its rank-error contract: the
    sketch guarantees the returned value's rank is within n/accuracy
    of the target rank. Per group the output carries the exact
    min/max/count plus one boolean per percentile asserting the rank
    window [count(x < v), count(x ≤ v)] overlaps
    p·n ± (n/accuracy + 1). Approx values are engine-specific and
    excluded; the booleans make the bound hash-checkable cross-engine.

    Plan: two aggregations over lineitem (sketch pass, then a rank
    count pass with the tiny per-group sketch row broadcast back) —
    both map-side combinable, no sort at any scale."""
    ap = lineitem.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("q_min"),
        F.approx_percentile("l_quantity", 0.25, accuracy).alias("__a25"),
        F.approx_percentile("l_quantity", 0.5, accuracy).alias("__a50"),
        F.approx_percentile("l_quantity", 0.75, accuracy).alias("__a75"),
        F.max("l_quantity").alias("q_max"),
        F.count("l_quantity").alias("n_rows"),
    )
    j = lineitem.select("l_returnflag", "l_quantity").join(
        F.broadcast(ap), "l_returnflag"
    )
    cnt = lambda c: F.sum(c.cast("long"))  # noqa: E731
    q = F.col("l_quantity")
    ranks = j.groupBy("l_returnflag").agg(
        *[
            agg
            for p in ("25", "50", "75")
            for agg in (
                cnt(q < F.col(f"__a{p}")).alias(f"__lo{p}"),
                cnt(q <= F.col(f"__a{p}")).alias(f"__hi{p}"),
            )
        ]
    )

    def ok(p: str, frac: float) -> Column:
        target = F.col("n_rows") * F.lit(frac)
        eps = F.col("n_rows") / F.lit(float(accuracy)) + F.lit(1.0)
        return (F.col(f"__lo{p}") <= target + eps) & (
            F.col(f"__hi{p}") >= target - eps
        )

    return ap.join(ranks, "l_returnflag").select(
        "l_returnflag",
        "q_min",
        "q_max",
        "n_rows",
        ok("25", 0.25).alias("q25_ok"),
        ok("50", 0.50).alias("q50_ok"),
        ok("75", 0.75).alias("q75_ok"),
    )


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Equi-width histogram — the profiling primitive behind every
    distribution panel. Bucketing is INTEGER-EXACT: values and edges
    move onto the cent lattice (2-decimal data × 100) and the bucket is
    one integer floor-division — no float boundary arithmetic, so a
    value sitting exactly on an edge lands in the same bucket on every
    engine (width_bucket's double divide can flip edge cases by one
    ulp). Out-of-range rows clamp into the end buckets, top edge
    inclusive (standard histogram convention).

    One combinable aggregate: partial counts per bucket fold map-side;
    shuffle volume is nbins rows per task, never the table."""
    c = (F.col(col).cast("decimal(18,2)") * 100).cast("long")
    lo_c, hi_c = int(round(lo * 100)), int(round(hi * 100))
    if hi_c <= lo_c or nbins <= 0 or (hi_c - lo_c) % nbins:
        # a non-divisible range would silently mislabel the top edge
        # (floor-divided width); a sub-cent width would divide by zero
        raise ValueError(
            f"histogram range [{lo}, {hi}] must split into {nbins} "
            "equal cent-lattice bins"
        )
    w_c = (hi_c - lo_c) // nbins
    raw = F.floor((c - F.lit(lo_c)) / F.lit(w_c)).cast("long")
    bucket = F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw))
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bucket",
            (F.lit(lo_c / 100.0) + F.col("bucket") * F.lit(w_c / 100.0)).alias(
                "lo_edge"
            ),
            (F.lit(lo_c / 100.0) + (F.col("bucket") + 1) * F.lit(w_c / 100.0)).alias(
                "hi_edge"
            ),
            "n_rows",
        )
    )


def active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Rolling engagement panel (DAU + trailing-``window_days`` WAU):
    for every calendar day up to the last observed day, how many
    distinct users were active that day and within the trailing
    window. The product-analytics staple next to retention cohorts.

    Aggregate-FIRST at every step — the event stream collapses to
    distinct (day, user) presence pairs (bounded by users × days,
    orders of magnitude below event volume) before anything else;
    the rolling window is an explode of each presence row into the
    ``window_days`` days it contributes to (bounded fan-out of the
    SMALL frame, never the events), re-distincted and counted. No
    count-distinct window function (which would hold per-day user
    sets in window state), no self-join over events."""
    day = F.to_date("ts").alias("day")
    pres = events.select(day, "user_id").distinct()
    # full calendar from first to last observed day — an activity gap
    # longer than the window must surface as dau=0/wau=0 rows, not a
    # silently compressed time axis. The 1-row bounds explode to
    # #days rows (decades ≈ 10⁴ — bounded), never touching events.
    calendar = (
        pres.agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(F.explode(F.sequence("__d0", "__d1")).alias("day"))
    )
    target = (
        pres.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), window_days - 1))
            ).alias("day"),
            "user_id",
        )
        .distinct()
    )
    wau = target.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    dau = pres.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        calendar.join(wau, "day", "left")
        .join(dau, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.coalesce("wau", F.lit(0)).alias("wau"),
        )
        .orderBy("day")
    )


def mad_stats(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Robust dispersion per group: median + MAD (median absolute
    deviation) — the outlier-resistant twin of mean/stddev that fence
    rules and robust z-scores (x−med)/MAD build on.

    Two grouped exact-percentile passes: the per-group median folds
    first (group-cardinality rows), broadcasts back onto the events,
    and the absolute deviation — computed on the DECIMAL tick lattice,
    so it is exact: value is 2-decimal, an interpolated median is at
    worst on the half-cent grid — feeds the second median. Quartile
    positions interpolate at exact binary fractions, bit-identical
    across engines (same guarantee a_percentiles relies on). At 100 TB
    exact percentiles sort within each group; swap approx_percentile
    in for the sketch path when audits do not require exactness."""
    med = events.groupBy(group_col).agg(
        F.percentile("value", 0.5).alias("median_val"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    dev = (
        F.abs(
            F.col("value").cast("decimal(18,2)")
            - F.col("median_val").cast("decimal(18,4)")
        )
    ).cast("double")
    return (
        events.join(F.broadcast(med), group_col)
        .select(group_col, "median_val", "n_rows", dev.alias("__dev"))
        .groupBy(group_col, "median_val", "n_rows")
        .agg(F.percentile("__dev", 0.5).alias("mad"))
        .select(group_col, "n_rows", "median_val", "mad")
        .orderBy(group_col)
    )


def unpivot_measure_totals(lineitem: DataFrame) -> DataFrame:
    """Wide→long reshape (the inverse of pivot_value_by_type): per
    return flag, three decimal-exact measure totals unpivoted into
    (measure, total) rows — the shape BI tools and metric stores
    ingest. Aggregate-FIRST: the melt runs on the tiny aggregated
    frame (groups × measures rows), never on the fact; unpivot itself
    is a pure Expand projection — no join, no extra shuffle."""
    agg = lineitem.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "total",
    ).orderBy("l_returnflag", "measure")


def measure_correlations(lineitem: DataFrame) -> DataFrame:
    """Exact Pearson correlations between fact measures (quantity ×
    price, quantity × discount, price × discount) — the profiling
    pass a modeling pipeline runs before feature selection.

    Why not ``F.corr``: its streaming covariance merge is partition-
    order-dependent in the last bits, so results drift across cluster
    layouts and engines. Here every moment (Σx, Σy, Σxy, Σx², Σy²)
    accumulates EXACTLY in decimal — per-row products of 2-decimal
    measures live on the 4-decimal lattice — in ONE scan/fold, and r
    is then a fixed tree of IEEE double ops on those exact moments:
    bit-identical on any engine and any partitioning. The oracle must
    route its wide moment casts through VARCHAR (functions/exact.py
    documents DuckDB's >53-bit decimal→double drift)."""
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    mom = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"), F.sum(p).alias("sp"), F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"), F.sum(p * p).alias("spp"),
        F.sum(d * d).alias("sdd"),
        F.sum(q * p).alias("sqp"), F.sum(q * d).alias("sqd"),
        F.sum(p * d).alias("spd"),
    )

    def _corr(sxy, sx, sy, sxx, syy):
        n = F.col("n").cast("double")
        num = n * F.col(sxy).cast("double") - F.col(sx).cast("double") * F.col(sy).cast("double")
        vx = n * F.col(sxx).cast("double") - F.col(sx).cast("double") * F.col(sx).cast("double")
        vy = n * F.col(syy).cast("double") - F.col(sy).cast("double") * F.col(sy).cast("double")
        return num / F.sqrt(vx * vy)

    return mom.select(
        F.col("n").alias("n_rows"),
        _corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        _corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        _corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 200) -> DataFrame:
    """EXACT frequent items — every value with frequency > n/k, with
    its exact count — via the distributed two-pass heavy-hitter
    pattern: per-partition Misra-Gries candidate summaries, then an
    exact verify restricted to candidates.

    Why not plain groupBy-count: over a 100 TB column with billions of
    DISTINCT values the full key set shuffles. Here pass 1 emits ≤ k
    candidate keys PER PARTITION (the mergeable-MG guarantee: any item
    with global freq > n/k has per-partition freq > n_p/(k+1) in at
    least one partition by averaging, so it survives that partition's
    summary); pass 2 semi-joins the broadcast candidates and counts
    only them — the shuffle carries ≤ k·P aggregated rows, never the
    key universe. Output is EXACT (counts come from pass 2, the MG
    counters are only a sieve), so the gate oracle is plain HAVING
    SQL.

    Pass 1 is Arrow-batched pandas (value_counts per batch, MG merge
    with (k+1)-th-largest subtraction between batches — vectorized,
    no per-row Python). The only extra job is the 1-row total count
    the threshold needs.

    NULL keys are EXCLUDED — from the candidates, the counts, and the
    total ``n`` the threshold divides (pandas value_counts drops them
    and a null key can't equi-join anyway, so silently counting nulls
    into ``n`` while never reporting them would skew every
    threshold). Callers who care about null frequency should
    ``coalesce`` to a sentinel first."""
    import pandas as pd

    key = df.select(F.col(col).cast("string").alias("__key")).filter(
        F.col("__key").isNotNull()
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf["__key"].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # mergeable-MG truncation: subtract the (k+1)-th
                # largest count, drop non-positive counters.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({"__key": pd.Series(list(counters), dtype="object")})

    cands = key.mapInPandas(mg_partition, "__key string").distinct()
    total = key.agg(F.count(F.lit(1)).alias("__n"))
    return (
        key.join(F.broadcast(cands), "__key", "left_semi")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("freq"))
        .join(F.broadcast(total))
        .filter(F.col("freq") > F.col("__n") / F.lit(float(k)))
        .select(F.col("__key").alias("item"), "freq")
    )


def sketch_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    col: str,
    rel_err: float = 0.05,
) -> DataFrame:
    """Persistable-sketch rollup — the incremental-cube pattern at
    100 TB: distinct-count sketches are built once at the FINE grain
    (``hll_sketch_agg`` → a storable binary column; in production the
    fine table is materialized per load) and every coarser grain
    re-aggregates by UNIONING the sketches (``hll_union_agg``) —
    register-wise max, associative — without ever rescanning the
    fact. ``approx_count_distinct`` cannot do this: its sketch never
    leaves the aggregation.

    Output certifies the pattern per coarse group: the exact distinct
    count (value-portable), ``bound_ok`` — the ROLLED-UP estimate
    lands within ``rel_err`` of exact (floored at an absolute 3 for
    tiny groups) — and ``merge_close_ok`` — rolled-up and direct
    coarse-grain estimates agree within ``merge_tol`` (dense-mode HLL
    union is register-wise max and lossless, but sparse→dense
    promotion order makes small-cardinality register state
    path-DEPENDENT — measured ~0.5% drift at 11k distincts — so the
    certificate bounds the two paths rather than equating them).
    Estimates themselves are engine-specific and stay out of the
    output (the distinct_counts_certified convention). Cost: two fact
    passes here because the certificate needs the direct twin;
    production pays ONE fine pass, then cube-sized unions."""
    merge_tol = 0.02
    fine = df.groupBy(*fine_keys).agg(F.hll_sketch_agg(col).alias("__sk"))
    rolled = fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est_rolled")
    )
    direct = df.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(col)).alias("__est_direct"),
        F.countDistinct(col).alias("n_exact"),
    )
    bound = F.greatest(F.lit(3.0), F.lit(float(rel_err)) * F.col("n_exact"))
    mbound = F.greatest(F.lit(3.0), F.lit(merge_tol) * F.col("n_exact"))
    return rolled.join(direct, coarse_keys).select(
        *coarse_keys,
        "n_exact",
        (F.abs(F.col("__est_rolled") - F.col("__est_direct")) <= mbound).alias(
            "merge_close_ok"
        ),
        (F.abs(F.col("__est_rolled") - F.col("n_exact")) <= bound).alias(
            "bound_ok"
        ),
    )


def _cms_bucket(item: Column, row: int, width: int) -> Column:
    """md5-derived Count-Min column index for hash row ``row`` —
    engine-portable (same bytes from DuckDB's md5/substr/conv chain)."""
    h = F.md5(F.concat(F.lit(f"{row}|"), item.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias(
        "c"
    )


def count_min_estimates(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    topn: int = 20,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) built as a
    depth×width cell table, then read back for the true top-``topn``
    items: (item, true_count, cms_estimate, no_underestimate,
    within_bound). The sketch is the mergeable fixed-size frequency
    summary a 100 TB stream reduces to — each partition folds its items
    into ≤ depth·width cells map-side (one struct explode per hash
    row), the shuffle moves only cells, and two sketches merge by cell
    addition.

    Certification: CMS never underestimates (est = min over rows of the
    item's cell ≥ true count — a theorem, so ``no_underestimate`` must
    be all-1), and overestimates by at most the collision mass
    (``within_bound``: est ≤ true + 2N/width, the Markov bound at twice
    the per-row expectation, held with margin by the min over
    ``depth`` independent rows). Both booleans are hash-covered; the
    estimates themselves are also exact cross-engine because every hash
    is md5-derived.
    """
    occurrences = items.select(F.col(item_col).cast("string").alias("item"))
    cells = count_min_cells(occurrences, depth=depth, width=width)
    return count_min_readback(
        cells, occurrences, depth=depth, width=width, topn=topn
    )


def count_min_cells(
    occurrences: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """The sketch itself: (r, c, cell) counts over an ``item`` column —
    a plain groupBy, so it runs UNCHANGED on a STREAMING DataFrame
    (complete mode): the engine maintains the ≤ depth·width cells
    incrementally across micro-batches, which IS the CMS merge
    (cell-wise addition). Split out so batch and streaming share one
    definition."""
    return (
        occurrences.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cms_bucket(F.col("item"), r, width),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rc")
        )
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def count_min_readback(
    cells: DataFrame,
    occurrences: DataFrame,
    depth: int = 4,
    width: int = 256,
    topn: int = 20,
) -> DataFrame:
    """Estimate read-back + certification against true counts (see
    count_min_estimates docstring for the bounds)."""
    true = occurrences.groupBy("item").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    top = true.orderBy(F.desc("true_count"), F.col("item")).limit(topn)
    total = occurrences.agg(F.count(F.lit(1)).alias("__n"))
    probes = top.select(
        "item",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(F.col("item"), r, width),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "true_count", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("item", "true_count")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "item",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("true_count"))
        .cast("long")
        .alias("no_underestimate"),
        (
            F.col("cms_estimate")
            <= F.col("true_count") + (2 * F.col("__n")) / width
        )
        .cast("long")
        .alias("within_bound"),
    )


def seasonal_anomalies(events: DataFrame, z: int = 3) -> DataFrame:
    """Seasonal-baseline anomaly flags: an event is anomalous when its
    value sits more than ``z``σ from the mean of its OWN seasonal cell
    (event_type × hour-of-day) — the calendar-profile twin of the
    trailing ``windows.zscore_outliers`` (a burst at 3 am is an
    anomaly even when the trailing window has already absorbed it).

    Same zero-float DECISION as the rolling variant: |x−μ| > z·σ
    multiplied through by n² — (n·x − Σx)² > z²·(n·Σx² − (Σx)²) — with
    every term in exact integer cents. The baseline is one grouped
    aggregate over ≤ |types|·24 cells (map-side combinable, broadcast
    back), so the corpus scans once and nothing corpus-sized shuffles.
    Overflow bound: n_cell·(100·max|v|)² < 2^63; at far larger cells
    swap the long sums for DECIMAL accumulators.
    """
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = events.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("int").alias("hour"),
        "value",
        cents.alias("__c"),
    )
    stats = base.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__c").alias("__sx"),
        F.sum(F.col("__c") * F.col("__c")).alias("__sx2"),
    )
    j = base.join(F.broadcast(stats), ["event_type", "hour"])
    n = F.col("n_obs")
    dev = n * F.col("__c") - F.col("__sx")
    var_n2 = n * F.col("__sx2") - F.col("__sx") * F.col("__sx")
    return j.select(
        "event_id",
        "event_type",
        "hour",
        "value",
        "n_obs",
        ((dev * dev).cast("double") / F.lit(10000.0)).alias("sq_dev_n2"),
        ((F.lit(z * z) * var_n2).cast("double") / F.lit(10000.0)).alias(
            "sq_bound_n2"
        ),
        (dev * dev > F.lit(z * z) * var_n2).alias("is_outlier"),
    )


def benford_digits(df: DataFrame, amount_col: str = "o_totalprice") -> DataFrame:
    """Benford's-law first-digit audit over a monetary column — the
    classic fraud/data-quality screen (fabricated amounts flunk the
    log-uniform leading-digit law). One narrow projection + a 9-row
    groupBy; nothing else moves.

    Exactness: the leading digit comes from the DECIMAL-cents integer
    rendered as a string (identical on any engine — no float
    formatting, no log10 of data). The expected proportions log10(1 +
    1/d) are data-independent CONSTANTS embedded as repr literals, so
    expected counts and χ² contributions are the same fixed double
    expressions on both sides.
    """
    import math

    cents = (F.col(amount_col).cast("decimal(18,2)") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    base = df.select(digit.alias("digit")).filter(F.col("digit") >= 1)
    counts = base.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    total = base.agg(F.count(F.lit(1)).alias("__total"))
    probs = F.array(*[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)])
    exp = F.col("__total") * F.element_at(probs, F.col("digit"))
    chi = (F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            exp.alias("expected_n"),
            chi.alias("chi2_term"),
        )
    )


def markov_transitions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """First-order Markov transition matrix of event types WITHIN
    sessions: (from_type, to_type, n_trans, p) with p row-normalized —
    the model behind next-action prediction and the summary the
    path-trigram query unrolls. Sessionize + one LEAD on the shared
    user exchange; the matrix is ≤ |types|² rows.
    """
    from .windows import sessionize
    from pyspark.sql import Window as _W

    sess = sessionize(events, gap_minutes)
    w = _W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    pairs = sess.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type", 1).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    row_tot = counts.groupBy("from_type").agg(
        F.sum("n_trans").alias("__row_n")
    )
    return counts.join(F.broadcast(row_tot), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        (F.col("n_trans") / F.col("__row_n")).alias("p"),
    )


def sign_runs(events: DataFrame) -> DataFrame:
    """Wald–Wolfowitz-style runs audit per user series: directions of
    consecutive value diffs (flat diffs dropped), counted as up-moves,
    down-moves, and maximal same-direction RUNS — a manipulated or
    synthetic series shows far fewer (trending fabrication) or far
    more (alternating fabrication) runs than a random one, which makes
    this the order-statistics cousin of the Benford digit screen.

    All-integer: signs are ±1 from exact DECIMAL-cents comparisons, a
    run boundary is ``sign ≠ lag(sign)``, and the count is a plain sum
    — two stacked windows (diff, then boundary over the flat-filtered
    sequence) on one user exchange plus a per-user rollup.
    """
    from pyspark.sql import Window as _W

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    diffed = events.select(
        "user_id",
        "ts",
        "event_id",
        (cents - F.lag(cents, 1).over(w)).alias("__d"),
    ).filter(F.col("__d").isNotNull() & (F.col("__d") != 0))
    sgn = F.when(F.col("__d") > 0, 1).otherwise(-1)
    signed = diffed.select("user_id", "ts", "event_id", sgn.alias("__s"))
    w2 = _W.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = (
        F.lag("__s", 1).over(w2).isNull()
        | (F.col("__s") != F.lag("__s", 1).over(w2))
    ).cast("long")
    return (
        signed.select("user_id", "__s", boundary.alias("__b"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.sum((F.col("__s") == 1).cast("long")).alias("n_up"),
            F.sum((F.col("__s") == -1).cast("long")).alias("n_down"),
            F.sum("__b").alias("n_runs"),
        )
    )


def aqp_group_estimates(
    orders: DataFrame, inv_fraction: int = 16, max_rel_err: float = 0.1
) -> DataFrame:
    """Approximate query processing (AQP) demonstrator: per-priority
    revenue estimated from a DETERMINISTIC 1/``inv_fraction`` hash
    sample (content-addressed — the same rows on every engine and
    run), scaled by the inverse fraction, CERTIFIED against the exact
    decimal aggregate computed alongside: (group, n_exact, n_sample,
    est_rev, exact_rev, rel_err_ok).

    This is the scan-1/16th-answer-in-1/16th-time trade an interactive
    dashboard makes at 100 TB; the certificate column keeps the gate
    honest (``rel_err_ok`` asserts |est−exact| ≤ ``max_rel_err``·exact
    — deterministic here because the sample is hash-fixed, and checked
    cross-engine since both sides replay the identical sample).
    Estimates stay decimal-exact (the ×inv_fraction scale is an
    integer multiply on the decimal accumulator), so the comparison is
    engine-exact too.
    """
    from ..functions.exact import dsum as _dsum

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("aqp|"), F.col("o_orderkey").cast("string"))
                .cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    in_sample = (h % inv_fraction == 0).cast("long")
    base = orders.select(
        "o_orderpriority", "o_totalprice", in_sample.alias("__s")
    )
    g = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum("__s").alias("n_sample"),
        _dsum("o_totalprice").alias("exact_rev"),
        _dsum(F.col("o_totalprice") * F.col("__s")).alias("__sample_rev"),
    )
    est = F.col("__sample_rev") * inv_fraction
    ok = (
        F.abs(est - F.col("exact_rev"))
        <= F.lit(max_rel_err) * F.col("exact_rev")
    )
    return g.select(
        "o_orderpriority",
        "n_exact",
        "n_sample",
        est.alias("est_rev"),
        "exact_rev",
        ok.cast("long").alias("rel_err_ok"),
    )


def ks_drift(
    events: DataFrame, type_a: str = "click", type_b: str = "view"
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of two event types — the drift test a pipeline runs
    between yesterday's and today's feature distribution before
    trusting a model. Output: one row (n_a, n_b, ks_num, ks_stat)
    where ks_stat = max|F_a − F_b|.

    Exact, no sort of the raw data: values collapse to per-DISTINCT-
    value counts first (one corpus shuffle; the 2-decimal tick lattice
    bounds distinct values by the value RANGE — ~10⁴·range ticks —
    independent of corpus size, so the subsequent ordered prefix sum
    runs over a bounded frame, the same vocabulary-sized-sort argument
    as the bitmap dictionary). The CDF difference cross-multiplies to
    integers: ks_num = max|n_b·C_a(v) − n_a·C_b(v)| is an exact
    BIGINT; the statistic divides once at the end.
    """
    from pyspark.sql import Window as _W

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    tagged = events.filter(
        F.col("event_type").isin(type_a, type_b)
    ).select(
        cents.alias("v"),
        (F.col("event_type") == type_a).cast("long").alias("__a"),
        (F.col("event_type") == type_b).cast("long").alias("__b"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("__a").alias("d_a"), F.sum("__b").alias("d_b")
    )
    w = _W.orderBy("v").rowsBetween(_W.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        F.sum("d_a").over(w).alias("c_a"),
        F.sum("d_b").over(w).alias("c_b"),
    )
    totals = tagged.agg(
        F.sum("__a").alias("n_a"), F.sum("__b").alias("n_b")
    )
    diffs = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("n_b") * F.col("c_a") - F.col("n_a") * F.col("c_b")
        ).alias("__d"),
    )
    return diffs.groupBy("n_a", "n_b").agg(
        F.max("__d").alias("ks_num")
    ).select(
        "n_a",
        "n_b",
        "ks_num",
        (
            F.col("ks_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("ks_stat"),
    )


def cramers_v(
    events: DataFrame, col_a: str = "event_type", col_b: str = "__dow"
) -> DataFrame:
    """Cramér's V association between two categoricals (does event mix
    depend on weekday?) — χ² over the contingency table normalized to
    [0, 1]: one row (n, r, c, chi2, cramers_v). The routine screen for
    "is this feature informative / is this drift structural".

    Exact-portable: observed counts are integers; each expected count
    is the rational (row·col)/n — the χ² term computes in ONE fixed
    double expression from exact BIGINTs ((o·n − rc)² / (rc·n),
    cross-multiplied so no intermediate rounding), summed over ≤ r·c
    cells after a broadcast join of the two margin vectors. V =
    √(χ²/(n·min(r−1, c−1))).
    """
    base = events.select(
        F.col(col_a).alias("a"),
        (
            F.dayofweek("ts").cast("int")
            if col_b == "__dow"
            else F.col(col_b)
        ).alias("b"),
    )
    obs = base.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    ra = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    n = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    # FULL r×c grid, not just observed combos — zero cells carry χ²
    # mass ((0−e)²/e) and omitting them understates the statistic
    grid = ra.crossJoin(cb)
    cells = (
        grid.join(obs, ["a", "b"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(n))
    )
    # dev² overflows int64 at corpus scale (dev ≤ o·n ≈ 1e10 → 1e20):
    # cast the exact integer dev to double FIRST (dev < 2^53, so the
    # cast is exact) and square in double — same op order both engines
    dev = (
        F.col("o") * F.col("n") - F.col("ra") * F.col("cb")
    ).cast("double")
    term = (dev * dev) / (
        (F.col("ra") * F.col("cb")).cast("double") * F.col("n").cast("double")
    )
    # χ² folds as a 2^-30-lattice BIGINT sum: cell order is partition-
    # dependent and a raw double Σ would drift in the last ulp
    lat = F.lit(float(1 << 30))
    chi2 = F.sum(F.floor(term * lat).cast("long")).cast("double") / lat
    return (
        cells.groupBy("n", "r", "c")
        .agg(chi2.alias("chi2"))
        .select(
            "n",
            "r",
            "c",
            "chi2",
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.least(F.col("r") - 1, F.col("c") - 1)
                ).cast("double")
            ).alias("cramers_v"),
        )
    )


def mann_kendall(events: DataFrame) -> DataFrame:
    """Mann–Kendall trend test per user series: S = Σ_{i<j}
    sign(x_j − x_i) and Kendall's τ = S / C(n,2) — the nonparametric
    "is this series trending" screen that complements the runs test
    (runs sees oscillation, MK sees monotone drift; neither assumes a
    distribution).

    The O(n²) pair scan runs ARRAY-NATIVE inside each user's row
    (collect → sort → nested fold): per-key series are bounded, so the
    quadratic is per-row constant work with NO self-join and no
    shuffle beyond the one collect_list aggregate — the same
    in-row-pairs shape as basket_pairs. S is an exact integer; τ is
    one division.
    """
    arr = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    base = events.groupBy("user_id").agg(arr.alias("__a"))
    vals = F.transform(F.col("__a"), lambda s: s["value"])
    pair_signs = F.transform(
        vals,
        lambda x, j: F.aggregate(
            F.slice(vals, 1, j),
            F.lit(0).cast("long"),
            lambda acc, y: acc
            + F.when(y < x, 1).when(y > x, -1).otherwise(0),
        ),
    )
    s_stat = F.aggregate(
        pair_signs, F.lit(0).cast("long"), lambda acc, t: acc + t
    )
    n = F.size(F.col("__a")).cast("long")
    return base.select(
        "user_id",
        n.alias("n_obs"),
        s_stat.alias("s_stat"),
        (
            s_stat.cast("double")
            / (n * (n - 1) / 2).cast("double")
        ).alias("tau"),
    )
