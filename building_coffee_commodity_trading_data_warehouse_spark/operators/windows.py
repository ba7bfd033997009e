"""Window analytics — the reference's analytical core (W1-W5).

The reference runs one window-function SQL statement inside Postgres
(reference ODS.py:59-80): per contract-month series it takes the *next*
row's contract and price (``lag(col, -1)`` ≡ ``lead``, ODS.py:62-64), a
calendar spread across month numbers within one snapshot date
(ODS.py:65), and 200-/50-row moving averages (ODS.py:66-67).

Here those semantics run on the synthetic star schema: ``l_partkey``
plays the contract-month series key, ``l_shipdate`` the snapshot date,
``l_extendedprice`` the price. All windows are native
``pyspark.sql.Window`` — each PARTITION BY is one hash shuffle, frames
are ROWS-based (streaming-friendly, no range scan), and moving averages
use decimal-exact accumulation (functions/exact.py) so results are
reproducible at any partitioning.

Scale notes: the window shuffle partitions by the series key; at 100 TB
the series-key cardinality (≈ #parts) is large so partitions stay small
and skew-free. Ordering includes unique tiebreakers (l_orderkey,
l_linenumber) so lead/lag are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import DEC

def w_series() -> Window:
    # Deterministic total order within a part's price series:
    # (l_orderkey, l_linenumber) is unique, so lead/lag are stable.
    return Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )


def next_values(lineitem: DataFrame) -> DataFrame:
    """W1+W2 (ODS.py:62-64): next row's key and price per series,
    with the reference's 'NaN' sentinel for the series edge (ODS.py:62
    coalesces the lagged text to 'NaN')."""
    w = w_series()
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.coalesce(
            F.lead(F.col("l_suppkey").cast("string"), 1).over(w), F.lit("NaN")
        ).alias("next_supp"),
        F.lead("l_extendedprice", 1).over(w).alias("next_price"),
    )


def moving_averages(lineitem: DataFrame) -> DataFrame:
    """W4+W5 (ODS.py:66-67): 200- and 50-row trailing moving averages
    per series, ROWS frames, exact accumulation."""
    out = with_trailing_means(
        lineitem.select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
        ),
        "l_extendedprice",
        w_series(),
        (200, 50),
    )
    return out


def with_trailing_means(
    df: DataFrame, col: str, w: Window, precedings: tuple[int, ...], prefix: str = "ma_"
) -> DataFrame:
    """Trailing ROWS-frame means via PREFIX SUMS: a naive
    ``ROWS BETWEEN n PRECEDING`` aggregate makes Spark re-scan the
    n-row buffer for EVERY row (O(n·frame) per partition); a running
    cumulative sum is maintained incrementally (O(n)), and the frame
    sum is ``cumsum - lag(cumsum, n+1)``. Decimal arithmetic keeps the
    subtraction bit-exact with the direct frame sum, so oracle parity
    is unaffected. One extra projection, same single shuffle+sort
    (both window specs share partitioning and ordering)."""
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    tmp = df.withColumns(
        {
            "_cum_sum": F.sum(F.col(col).cast(DEC)).over(cum),
            "_cum_cnt": F.count(F.col(col)).over(cum),
        }
    )
    outs = {}
    for n in precedings:
        prev_sum = F.coalesce(F.lag("_cum_sum", n + 1).over(w), F.lit(0).cast(DEC))
        prev_cnt = F.coalesce(F.lag("_cum_cnt", n + 1).over(w), F.lit(0))
        outs[f"{prefix}{n}"] = (
            (F.col("_cum_sum") - prev_sum).cast("double")
            / (F.col("_cum_cnt") - prev_cnt)
        ).cast("double")
    return tmp.withColumns(outs).drop("_cum_sum", "_cum_cnt")


def calendar_spread(lineitem: DataFrame) -> DataFrame:
    """W3 (ODS.py:65): within one snapshot date, price minus the
    previous price in descending series-key order, rounded to 2
    (the reference rounds: ``round(last - lag(last) over (...), 2)``)."""
    w = Window.partitionBy("l_shipdate").orderBy(
        F.col("l_partkey").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_partkey",
        F.round(
            F.col("l_extendedprice") - F.lag("l_extendedprice", 1).over(w), 2
        ).alias("spread"),
    )


def flagship(lineitem: DataFrame) -> DataFrame:
    """The reference's flagship statement (ODS.py:59-80) as ONE plan:
    W1-W5 together, the way the windowed SELECT feeds the fact build.

    Two window specs → two shuffles (by series key, by snapshot date);
    Catalyst evaluates both window operators in a single pass each.
    """
    w_mo = w_series()
    w_day = Window.partitionBy("l_shipdate").orderBy(
        F.col("l_partkey").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    # STAGE ORDER = SHUFFLE ORDER: all w_mo windows (lead/lag, then the
    # prefix-sum means, then their lags) stack on ONE Exchange+Sort by
    # l_partkey; the w_day spread runs last on its own Exchange. Mixing
    # them in one select costs a third exchange (mo → day → mo).
    base = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_shipdate",
        "l_extendedprice",
        F.coalesce(
            F.lead(F.col("l_suppkey").cast("string"), 1).over(w_mo), F.lit("NaN")
        ).alias("next_supp"),
        F.lead("l_extendedprice", 1).over(w_mo).alias("next_price"),
    )
    with_mas = with_trailing_means(base, "l_extendedprice", w_mo, (200, 50))
    return with_mas.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        # dates surface as strings: engine-portable (a Spark DATE and a
        # DuckDB DATE round-trip differently through pandas)
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        F.col("l_extendedprice").alias("price"),
        "next_supp",
        "next_price",
        F.round(
            F.col("l_extendedprice") - F.lag("l_extendedprice", 1).over(w_day), 2
        ).alias("spread"),
        "ma_200",
        "ma_50",
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + conditional cumsum (batch twin of the
    streaming session_window). Not in the reference; standard OLAP
    surface for the events table."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(by_user))
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def trailing_time_mean(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_seconds: int = 3600,
) -> DataFrame:
    """Time-based trailing mean: avg of ``value_col`` over the last
    ``window_seconds`` per key — a RANGE frame over epoch seconds, not
    a ROWS frame, so gaps and bursts are handled by TIME ("30-day
    trailing average" semantics a trading desk expects, vs. the
    reference's row-count frames, ODS.py:66-67).

    Deterministic even with timestamp ties: a RANGE frame includes all
    peers of the current row, so no tiebreak ordering is needed. Sum
    runs in DECIMAL (order-independent); one exchange on the key.
    """
    epoch = F.unix_timestamp(F.col(ts_col)).alias("__epoch")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__epoch"))
        .rangeBetween(-window_seconds, 0)
    )
    v = F.col(value_col)
    mean = (F.sum(v.cast(DEC)).over(w).cast("double") / F.count(v).over(w)).alias(
        "trailing_mean"
    )
    return events.select("event_id", key_col, ts_col, value_col, epoch).select(
        "event_id",
        key_col,
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        value_col,
        mean,
    )


def gap_islands(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    key (streak detection — "n-day activity streaks" product metric).

    Classic anchor trick, fully relational: distinct active days per
    key, row_number within key by day, then day − row_number is
    constant within a consecutive run — group on that anchor. Plan:
    distinct (one exchange on key+day), window on key (second
    exchange), final agg partial-aggregates map-side. No UDF, no self
    join, survives any key cardinality."""
    days = (
        events.select(F.col(key_col), F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("day")
    anchored = days.withColumn(
        "__anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        anchored.groupBy(key_col, "__anchor")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).cast("int").alias("n_days"),
        )
        .drop("__anchor")
    )


def percentile_ranks(lineitem: DataFrame) -> DataFrame:
    """Distribution-position battery: percent_rank / cume_dist / ntile
    quartiles per group. percent_rank and cume_dist are tie-aware
    (peers share a value) so they are deterministic by definition;
    ntile is NOT tie-stable, so the ordering pins a full unique
    tiebreak — the difference between a reproducible quartile
    assignment and one that reshuffles per run at 100 TB."""
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def frame_values(lineitem: DataFrame) -> DataFrame:
    """first_value / last_value / nth_value over an explicit
    whole-partition ROWS frame (the ANSI default frame silently stops
    at CURRENT ROW for last_value — the classic window bug; pinning the
    frame makes the semantics, and the cross-engine results, exact).
    Ordering carries a full unique tiebreak."""
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
    )


def cumulative_distinct(events: DataFrame) -> DataFrame:
    """Running COUNT(DISTINCT) over time — not directly expressible as
    a window aggregate (distinct isn't frame-decomposable), so it
    composes: first-occurrence flag (row_number == 1 per
    (key, value) pair) then a cumulative sum of flags per key. Two
    window passes on different keys → two exchanges, both carrying
    narrow rows; no state beyond the running sum. The 100 TB
    alternative for APPROX semantics is a merging HLL sketch per
    frame; this is the exact path."""
    first_seen = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    running = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = events.withColumn(
        "__first", (F.row_number().over(first_seen) == 1).cast("long")
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "event_type",
        F.sum("__first").over(running).alias("n_distinct_types_seen"),
    )


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "filled",
) -> DataFrame:
    """LOCF (last-observation-carried-forward): NULLs take the latest
    preceding non-NULL per key — the standard sparse-to-dense repair
    for market data (hold the last quote until a new one arrives).
    One window pass, one exchange on the key; `last(ignorenulls)` is
    O(1) running state per row (the same primitive the as-of join
    builds on)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def rolling_volatility(events: DataFrame, window_rows: int = 20) -> DataFrame:
    """Trailing realized volatility per user: stddev of ``value`` over
    the last ``window_rows`` events — the rolling risk metric a
    commodity desk keeps next to the MA50/MA200 the reference charts
    (ODS.py:66-67 frames, dispersion instead of mean).

    Determinism recipe (same as aggregates.variance_stats): the frame's
    Σx and Σx² accumulate in DECIMAL (order-independent, exact), then
    variance combines them in ONE fixed double expression tree —
    engine- and partitioning-independent, unlike native stddev whose
    double partial merges drift at the last bit. greatest(0, ·) clamps
    the catastrophic-cancellation epsilon so sqrt never sees a negative.
    One exchange on user_id; frame evaluation is O(frame) per row on a
    sorted run, never a second shuffle."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window_rows - 1), 0)
    )
    v = F.col("value")
    n = F.count(v).over(w)
    sx = F.sum(v.cast(DEC)).over(w).cast("double")
    sx2 = F.sum((v * v).cast(DEC)).over(w).cast("double")
    mean = sx / n
    var = F.greatest(F.lit(0.0), sx2 / n - mean * mean)
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        n.alias("n_obs"),
        mean.alias("roll_mean"),
        F.sqrt(var).alias("roll_vol"),
    )


def ewma(events: DataFrame, window_rows: int = 20) -> DataFrame:
    """Truncated exponential moving average per user with decay 1/2 —
    EMA is the other half of the reference's moving-average toolkit
    (MA50/MA200 are flat windows; MACD-style signals weight recent
    ticks more). Truncation at ``window_rows`` bounds the relative
    error at 2^-window_rows (~1e-6 of the oldest tick) and keeps the
    state a fixed-size frame.

    Cross-engine exactness without libm: the decay is a POWER OF TWO,
    and every term is scaled UP by ``2^(top−k)`` — a 2-decimal tick
    times an integer power of two stays exactly on the 0.01 grid, so
    the whole weighted sum accumulates in DECIMAL(38,2) with zero
    rounding anywhere (no per-term 2^-k division, no high-scale
    decimal). The single inexact step is the LAST one: the exact
    decimal total divided by ``2^top`` after a cast to double — one
    correctly-rounded IEEE division, bit-identical on any engine.
    One exchange on user_id; the frame is a 20-element array per row."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    acc_t = "decimal(38,2)"
    top = window_rows - 1
    with_frame = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(order).alias("__rn"),
        F.collect_list(F.struct(F.row_number().over(order).alias("rn"), F.col("value")))
        .over(order.rowsBetween(-top, 0))
        .alias("__frame"),
    )

    # Scale every term UP by 2^(top-k) instead of down by 2^-k: a
    # 2-decimal tick times an integer power of two stays on the 0.01
    # lattice, so the DECIMAL(38,2) cast and the fold are EXACT — one
    # final division by 2^top (an exponent shift) lands the EWMA. The
    # weights are literal exact doubles; no runtime pow, no rounding
    # step anywhere for a tie to live in.
    scale_up = F.array(*[F.lit(float(2 ** (top - k))) for k in range(window_rows)])

    def term(s):
        k = F.col("__rn") - s.getField("rn")
        return (s.getField("value") * F.element_at(scale_up, k + 1)).cast(acc_t)

    folded = F.aggregate(
        F.col("__frame"),
        F.lit(0).cast(acc_t),
        lambda acc, s: (acc + term(s)).cast(acc_t),
    )
    return with_frame.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        F.size(F.col("__frame")).alias("n_terms"),
        (folded.cast("double") / F.lit(float(2**top))).alias("ewma"),
    )


def drawdown(events: DataFrame) -> DataFrame:
    """Running peak and drawdown per user over the tick sequence — the
    risk metric read off every equity curve (how far below the
    high-water mark is this series right now). Peak is a running MAX
    (unbounded-preceding frame, O(1) state per row); drawdown is one
    subtraction of two same-lattice doubles — no accumulation, nothing
    to drift, identical on any engine. One exchange on user_id."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        peak.alias("peak"),
        (peak - F.col("value")).alias("drawdown"),
    )


def zscore_outliers(events: DataFrame, window_rows: int = 50, z: int = 3) -> DataFrame:
    """Trailing z-score anomaly flag per user: an event is an outlier
    when it sits more than ``z`` standard deviations from the mean of
    its own trailing ``window_rows`` window — the standard streaming
    data-quality tripwire (sensor glitches, bot bursts, fat-finger
    ticks) run as a batch operator.

    Zero floating point in the DECISION: multiply ``|x−μ| > z·σ``
    through by n² and square it —

        (n·x − Σx)²  >  z² · (n·Σx² − (Σx)²)

    — with every term computed in PLAIN 64-BIT INTEGER CENTS (ticks
    are 2-decimal, so cents are exact): no sqrt, no division, no
    epsilon, and no decimal arithmetic in the hot window either —
    long sums under a moving frame codegen ~40% faster than the
    decimal(18,x) formulation they replaced, with bit-identical flags
    (measured at sf0.1). Range: safe while n·(100·|value|)² < 2^63,
    i.e. |value| ≤ ~$4.2M at window 50 — the same order as the old
    decimal(18,4) headroom. The squared deviation and bound leave as
    doubles on the scale-4 lattice (one correctly-rounded division by
    10^4 each, matching the decimal formulation's cast exactly).
    One exchange on user_id; the frame is O(window) per row."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window_rows - 1), 0)
    )
    c = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(c).over(w)
    sx2 = F.sum(c * c).over(w)
    dev = n * c - sx
    var_n2 = n * sx2 - sx * sx
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        n.alias("n_obs"),
        ((dev * dev).cast("double") / F.lit(10000.0)).alias("sq_dev_n2"),
        ((F.lit(z * z) * var_n2).cast("double") / F.lit(10000.0)).alias(
            "sq_bound_n2"
        ),
        (dev * dev > F.lit(z * z) * var_n2).alias("is_outlier"),
    )


def rolling_correlation(lineitem: DataFrame, window_rows: int = 20) -> DataFrame:
    """Trailing Pearson correlation between quantity and price per
    part over the last ``window_rows`` line items — the windowed twin
    of aggregates.correlation_matrix (pairs-trading / hedging signal:
    a desk watches whether volume still moves with price).

    Determinism recipe: every addend (x, y, xy, x², y²) floor-
    quantizes onto the 2^-16 lattice (×2^16 exact, floor exact) and
    the five frame sums fold as BIGINTs — associative AND free of the
    double→DECIMAL cast, whose 6th-decimal rounding tie-splits
    HALF_UP (Spark) vs HALF_EVEN (DuckDB) on squared prices (measured:
    one lineitem frame's Σy² differed by 1e-6 between engines). The
    correlation then combines the de-quantized sums in ONE fixed
    double expression tree; zero-variance frames emit NULL (CASE'd
    identically). One exchange on l_partkey; O(frame) per row."""
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-(window_rows - 1), 0)
    )
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    lat = F.lit(float(1 << 16))

    def _s(col):
        q = F.floor(col * lat).cast("long")
        return F.sum(q).over(w).cast("double") / lat

    n = F.count(x).over(w).cast("double")
    sx = _s(x)
    sy = _s(y)
    sxy = _s(x * y)
    sxx = _s(x * x)
    syy = _s(y * y)
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0), num / F.sqrt(vx * vy)
    ).otherwise(F.lit(None).cast("double"))
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        n.cast("long").alias("n_obs"),
        corr.alias("roll_corr"),
    )


def rsi(lineitem: DataFrame, periods: int = 14) -> DataFrame:
    """Relative Strength Index per part over its price series — the
    momentum oscillator (Wilder) a commodity desk reads next to the
    reference's MA50/MA200: RSI = 100 − 100/(1+RS) with RS = mean
    gain / mean loss over the trailing ``periods`` price moves
    (simple-average variant, not Wilder smoothing, so the window stays
    a plain frame).

    Determinism: price moves are IEEE subtractions of raw doubles;
    gains/losses clamp via GREATEST/LEAST (exact); their frame sums
    floor-quantize onto the 2^-16 lattice and fold as BIGINTs (the
    double→DECIMAL cast tie-splits across engines — see
    rolling_correlation); the final RS and RSI are a fixed double
    expression tree. All-loss frames (mean gain 0) → RSI 0, all-gain
    frames (mean loss 0) → RSI 100, CASE'd identically on both
    engines. Warm-up rows with fewer than ``periods`` moves emit NULL.
    One l_partkey exchange shared by the lag and the frame sums."""
    # one canonical ordering — the formatted day string + keys — used
    # by BOTH the lag and the frame sums, so the SQL twin mirrors a
    # single ORDER BY expression.
    order = Window.partitionBy("l_partkey").orderBy(
        F.date_format("l_shipdate", "yyyy-MM-dd"), "l_orderkey", "l_linenumber"
    )
    diff = F.col("l_extendedprice") - F.lag("l_extendedprice").over(order)
    # first row per part has no move: keep gain/loss NULL EXPLICITLY
    # (GREATEST's null semantics differ across engines) so the frame
    # count sees only real moves on both sides.
    moves = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        F.when(diff.isNull(), F.lit(None).cast("double"))
        .otherwise(F.greatest(diff, F.lit(0.0)))
        .alias("__gain"),
        F.when(diff.isNull(), F.lit(None).cast("double"))
        .otherwise(-F.least(diff, F.lit(0.0)))
        .alias("__loss"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("ship_date", "l_orderkey", "l_linenumber")
        .rowsBetween(-(periods - 1), 0)
    )
    lat = F.lit(float(1 << 16))
    n = F.count("__gain").over(w)
    gain = F.sum(F.floor(F.col("__gain") * lat).cast("long")).over(w).cast(
        "double"
    ) / lat
    loss = F.sum(F.floor(F.col("__loss") * lat).cast("long")).over(w).cast(
        "double"
    ) / lat
    rsi_val = (
        F.when(n < periods, F.lit(None).cast("double"))
        .when((gain == 0) & (loss == 0), F.lit(None).cast("double"))
        .when(loss == 0, F.lit(100.0))
        .when(gain == 0, F.lit(0.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + gain / loss))
    )
    return moves.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "ship_date",
        rsi_val.alias("rsi"),
    )


def anchored_vwap(lineitem: DataFrame) -> DataFrame:
    """Daily and anchored (running) volume-weighted average price per
    part — the execution benchmark a trading desk quotes against
    ("am I filling better than VWAP since the series started?").

    Exactness: Σ(price·qty) and Σqty fold in DECIMAL per (part, day),
    the anchored totals are cumulative DECIMAL window sums over the
    day-level frame (part-sized partitions), and each VWAP is ONE
    IEEE division of the two exact totals — engine- and
    partitioning-identical. Aggregate-first: the window runs over
    #parts × #days rows, never the fact table."""
    per_day = (
        lineitem.groupBy(
            "l_partkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("trade_date"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(DEC)
            ).alias("__pq"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("__q"),
        )
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("trade_date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_day.select(
        "l_partkey",
        "trade_date",
        (F.col("__pq").cast("double") / F.col("__q").cast("double")).alias(
            "day_vwap"
        ),
        (
            F.sum("__pq").over(w).cast("double")
            / F.sum("__q").over(w).cast("double")
        ).alias("anchored_vwap"),
    )


def bollinger_bands(
    lineitem: DataFrame, window_rows: int = 20, k: int = 2
) -> DataFrame:
    """Bollinger bands per part price series: trailing ``window_rows``
    mean ± ``k`` standard deviations, plus %B (where the tick sits
    inside the band). Completes the reference's moving-average toolkit
    (ODS.py:66-67 charts MA50/MA200; a desk overlays the dispersion
    envelope on the same frames).

    Determinism recipe (rolling_correlation's): price and price²
    floor-quantize onto the 2^-16 lattice and the frame sums fold as
    BIGINTs — associative, and free of the double→DECIMAL cast whose
    6th-decimal rounding tie-splits HALF_UP vs HALF_EVEN on squared
    prices. Mid, σ, bands, and %B then combine in ONE fixed double
    expression tree (each op individually correctly rounded on
    bit-identical operands), so any engine and any partitioning lands
    the same bits; a zero-variance frame has σ=0 and a NULL %B. One
    exchange on l_partkey (part-sized partitions — small and
    skew-free at any corpus scale); the frame scan is O(frame) per
    row on the sorted run, no second shuffle."""
    w = w_series().rowsBetween(-(window_rows - 1), 0)
    v = F.col("l_extendedprice")
    lat = F.lit(float(1 << 16))

    def _s(col):
        return F.sum(F.floor(col * lat).cast("long")).over(w).cast("double") / lat

    n = F.count(v).over(w).cast("double")
    sx = _s(v)
    sxx = _s(v * v)
    mid = sx / n
    vx = n * sxx - sx * sx
    sd = F.when(vx > 0, F.sqrt(vx) / n).otherwise(F.lit(0.0))
    upper = mid + F.lit(float(k)) * sd
    lower = mid - F.lit(float(k)) * sd
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        v.alias("price"),
        n.cast("long").alias("n_obs"),
        mid.alias("mid"),
        upper.alias("upper"),
        lower.alias("lower"),
        F.when(upper != lower, (v - lower) / (upper - lower)).alias("pct_b"),
    )


def global_row_numbers(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    out_col: str = "row_num",
) -> DataFrame:
    """Dense 1-based global row numbers under the total order of
    ``key_col`` (unique, numeric-orderable) — WITHOUT the
    empty-``partitionBy()`` window that funnels the whole table
    through one task (the anti-pattern top_suppliers/pareto were
    rewritten away from).

    Distributed shape (the pareto prefix-sum pattern,
    plans/analytics.py pareto_customers): rows bucket by deterministic
    VALUE ranges (width_bucket over the broadcast min/max — a pure
    function of the key, no sampled boundaries, so re-runs are
    bit-identical); each bucket numbers its own rows under a
    bucket-partitioned window (ONE corpus exchange, on ``__b``); the
    cross-bucket offsets come from the tiny per-bucket counts
    (≤ ``n_buckets`` rows — their single-partition prefix sum is
    bucket-sized, never corpus-sized) broadcast back. A skewed key
    distribution skews bucket sizes, never correctness."""
    from ..caching import scoped_persist

    key = F.col(key_col)
    stats = df.agg(
        F.min(key.cast("double")).alias("__lo"),
        F.max(key.cast("double")).alias("__hi"),
    )
    bucket = F.when(F.col("__lo") == F.col("__hi"), F.lit(1)).otherwise(
        F.least(
            F.lit(n_buckets),
            F.width_bucket(
                key.cast("double"), F.col("__lo"), F.col("__hi"), F.lit(n_buckets)
            ),
        )
    )
    bucketed = scoped_persist(
        df.crossJoin(F.broadcast(stats)).withColumn("__b", bucket)
    )
    offsets = (
        bucketed.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__b", "__off")
    )
    w_in = Window.partitionBy("__b").orderBy(key_col)
    return (
        bucketed.join(F.broadcast(offsets), "__b")
        .select(
            *df.columns,
            (F.col("__off") + F.row_number().over(w_in)).alias(out_col),
        )
    )


def rolling_quartiles(lineitem: DataFrame, window_rows: int = 20) -> DataFrame:
    """Trailing EXACT order statistics per part: q25/median/q75 (and
    IQR) of quantity over the last ``window_rows`` line items — the
    robust-dispersion twin of rolling_volatility (an IQR band flags
    regime change without the outlier sensitivity of σ).

    Unlike the mean/variance family there is no prefix-sum shortcut
    for order statistics — the frame must be ranked per row, O(frame
    · log frame) inside the JVM's window buffer, still partition-
    parallel by part with ONE exchange. Determinism recipe: quantity
    floor-quantizes onto the 2^-16 lattice first, so the linear
    interpolation between adjacent order statistics runs on exact
    integers with dyadic weights g ∈ {0, ¼, ½, ¾} (n ≤ 20 ⇒ (n−1)/4
    is a quarter-multiple) — every lerp term is an exact double on
    both engines, and the final /2^16 de-quantize is a power-of-two
    division. percentile() here = DuckDB quantile_cont, verified
    value-identical."""
    # ship_date strings (yyyy-MM-dd) sort identically to the DATE they
    # format, so the window can order by the projected column
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("ship_date", "l_orderkey", "l_linenumber")
        .rowsBetween(-(window_rows - 1), 0)
    )
    lat = F.lit(float(1 << 16))
    q = F.floor(F.col("l_quantity") * lat).cast("long")
    # Exact per-row rank stats are CPU-heavy relative to their byte
    # size, so AQE's byte-based coalescing under-parallelizes the
    # window stage; an explicit repartition by the window key is
    # exempt from coalescing, satisfies the window's clustering
    # requirement (no second exchange), and pins the parallelism.
    par = lineitem.sparkSession.sparkContext.defaultParallelism
    qdf = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        q.alias("__q"),
    ).repartition(par, "l_partkey")

    def _p(frac: float) -> Column:
        return F.expr(f"percentile(__q, {frac})").over(w) / lat

    q25 = _p(0.25)
    med = _p(0.5)
    q75 = _p(0.75)
    return qdf.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "ship_date",
        F.count("__q").over(w).cast("long").alias("n_obs"),
        q25.alias("q25"),
        med.alias("median"),
        q75.alias("q75"),
        (q75 - q25).alias("iqr"),
    )


def holt_smoothing(events: DataFrame) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per
    user value series — the classic short-horizon forecaster the EWMA
    family cannot express: ``ewma`` is a scalar power fold, but Holt's
    two COUPLED states make each step a 2×2 matrix recurrence with no
    per-row closed form, so this is the honest custom-stateful case:
    an Arrow-batched ``applyInPandas`` fold per key (one shuffle on
    user_id, series iterated sequentially inside the executor — the
    same shape a 100 TB run needs, since each key's series must be
    visited in order no matter the engine).

    Engine exactness without lattices: α=½, β=¼ — every smoothing
    multiply is by a dyadic constant (exact in binary), the remaining
    adds are single correctly-rounded IEEE ops executed in the same
    textual order as the DuckDB recursive-CTE oracle, so the floats
    match bit-for-bit. Init: level₀ = y₀, trend₀ = 0.

    Output: (user_id, event_id, seq, level, trend, forecast) with
    forecast = one-step-ahead level + trend.
    """
    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        levels, trends = [], []
        lvl = trend = 0.0
        for i, y in enumerate(pdf["value"].astype(float)):
            if i == 0:
                lvl, trend = float(y), 0.0
            else:
                new_lvl = 0.5 * float(y) + 0.5 * (lvl + trend)
                trend = 0.25 * (new_lvl - lvl) + 0.75 * trend
                lvl = new_lvl
            levels.append(lvl)
            trends.append(trend)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "seq": range(1, len(pdf) + 1),
                "level": levels,
                "trend": trends,
            }
        )

    out_schema = (
        "user_id long, event_id long, seq long, level double, trend double"
    )
    # The fold is Python-CPU-bound but its shuffle is only a few MB,
    # so AQE's byte-based coalescing would collapse it to ~3 tasks
    # (measured 3.6x wall at sf0.1). An explicit repartition by the
    # group key is exempt from AQE coalescing, satisfies the
    # applyInPandas clustering requirement (no second exchange), and
    # states the intended parallelism explicitly for cluster runs.
    par = events.sparkSession.sparkContext.defaultParallelism
    folded = (
        events.select("user_id", "event_id", "ts", "value")
        .repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(fold, out_schema)
    )
    return folded.select(
        "user_id",
        "event_id",
        "seq",
        "level",
        "trend",
        (F.col("level") + F.col("trend")).alias("forecast"),
    )


def cusum_changepoints(events: DataFrame, h_units: int = 200) -> DataFrame:
    """One-sided CUSUM change detection per user: the alarm statistic
    s_t = max(0, s_{t−1} + (x_t − μ)) looks inherently sequential, but
    it has the classic prefix rewrite s_t = P_t − min_{j≤t} P_j with
    P = Σ(x−μ) — so the whole detector becomes TWO stacked window
    functions (running sum, running min) on ONE exchange per user key,
    no applyInPandas, no recursion. μ is the user's own mean
    (two-pass: one tiny per-user aggregate broadcast back).

    Zero floating point anywhere: x quantizes to the 2^-16 lattice and
    the deviation multiplies through by n — d_t = n·c_t − Σc is an
    exact integer, so P, its running min, s, and the alarm comparison
    s_t > h·n·2^16 all stay in BIGINT. The reported statistic leaves
    as ONE double division at the end. Alarm threshold ``h_units`` is
    in value units.
    """
    lat = 1 << 16
    c = F.floor(F.col("value") * F.lit(float(lat))).cast("long")
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        c.alias("__c"),
    )
    stats = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__c").alias("__sx")
    )
    j = base.join(F.broadcast(stats), "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    dev = F.col("__n") * F.col("__c") - F.col("__sx")
    # two projections because window functions cannot nest — both
    # specs share partitioning+ordering, so they stack on ONE exchange
    with_p = j.withColumn("__p", F.sum(dev).over(run))
    # the prefix minimum must include the EMPTY prefix (P₀ = 0) — the
    # textbook recursion starts at s₀ = max(0, d₀), so a first positive
    # deviation must surface; min over rows alone would zero it
    # (caught by the hypothesis property test)
    s = F.col("__p") - F.least(
        F.lit(0).cast("long"), F.min("__p").over(run)
    )  # ≥ 0 by construction
    alarm = s > F.col("__n") * F.lit(h_units * lat)
    return with_p.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        F.col("__n").alias("n_obs"),
        (s.cast("double") / (F.col("__n") * F.lit(float(lat)))).alias(
            "cusum_stat"
        ),
        alarm.alias("is_alarm"),
    )


def interpolate_linear(
    events: DataFrame, mask_mod: int = 5
) -> DataFrame:
    """Time-weighted LINEAR interpolation of missing series values per
    user — the step up from ``forward_fill`` (which holds the last
    value flat): a gap is filled on the straight line between its
    bracketing observations, weighted by actual timestamps, the
    standard sensor/price-series repair before resampling.

    Missingness here is deterministic for the gate (event_id %
    ``mask_mod`` == 0 is masked); production passes a column that is
    already NULL. Both neighbor scans are IGNORE NULLS window
    extremes — last non-null value/timestamp looking back, first
    looking forward — stacked on ONE user exchange (same
    partitioning+ordering, two frame directions). Timestamps diff as
    exact epoch-microsecond BIGINTs; the interpolation is one fixed
    double expression (prev + (next−prev)·frac), bit-identical across
    engines; edges degrade to the available side.
    """
    masked = F.when(
        F.col("event_id") % mask_mod == 0, F.lit(None).cast("double")
    ).otherwise(F.col("value"))
    t = F.unix_micros(F.col("ts"))
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        masked.alias("__v"),
        t.alias("__t"),
    )
    w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    back = w.rowsBetween(Window.unboundedPreceding, -1)
    fwd = w.rowsBetween(1, Window.unboundedFollowing)
    vp = F.last("__v", ignorenulls=True).over(back)
    tp = F.last(F.when(F.col("__v").isNotNull(), F.col("__t")), True).over(back)
    vn = F.first("__v", ignorenulls=True).over(fwd)
    tn = F.first(F.when(F.col("__v").isNotNull(), F.col("__t")), True).over(fwd)
    frac = (F.col("__t") - tp).cast("double") / (tn - tp).cast("double")
    interp = vp + (vn - vp) * frac
    filled = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
        F.when(tp.isNotNull() & tn.isNotNull() & (tn != tp), interp)
        .when(tp.isNotNull() & tn.isNotNull(), vp)
        .when(tp.isNotNull(), vp)
        .otherwise(vn)
    )
    return base.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        F.col("__v").isNull().cast("long").alias("was_masked"),
        filled.alias("filled_value"),
    )


def forecast_intervals(events: DataFrame) -> DataFrame:
    """Per-user forecast-error calibration for the Holt forecaster —
    conformal-style: run ``holt_smoothing``, score each one-step-ahead
    forecast against the realized next value, and summarize the
    residual distribution per user as exact quartiles — (user_id,
    n_resid, q25_resid, median_resid, q75_resid). Adding these offsets
    to a live forecast yields an empirical prediction interval, the
    step that turns a point forecaster into something a desk can act
    on.

    Shapes: the forecast fold shuffles once on user_id; the realized
    next value is one LEAD on the same key; residuals floor-quantize
    onto the 2^-16 lattice so the per-user exact percentiles (dyadic
    quartile positions) stay engine-exact.
    """
    h = holt_smoothing(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = events.select(
        "user_id",
        "event_id",
        F.lead("value", 1).over(w).alias("next_value"),
    )
    lat = F.lit(float(1 << 16))
    resid = F.floor(
        (F.col("next_value") - F.col("forecast")) * lat
    ).cast("long")
    j = (
        h.join(nxt, ["user_id", "event_id"])
        .filter(F.col("next_value").isNotNull())
        .select("user_id", resid.alias("__r"))
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_resid"),
        (F.percentile("__r", 0.25) / lat).alias("q25_resid"),
        (F.percentile("__r", 0.5) / lat).alias("median_resid"),
        (F.percentile("__r", 0.75) / lat).alias("q75_resid"),
    )


def on_balance_volume(lineitem: DataFrame) -> DataFrame:
    """On-balance volume per part series: OBV_t = OBV_{t−1} ±
    quantity, sign taken from the price move (flat moves contribute
    zero) — the classic volume-confirms-price indicator, and another
    "sequential" recurrence that is really just a running sum of
    signed terms: one lag for the price diff, one cumulative sum, both
    on the SAME part exchange.

    All-integer: price diffs compare on the DECIMAL tick lattice and
    quantities fold as lattice BIGINTs; the indicator leaves as one
    double division.
    """
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("ship_date", "l_orderkey", "l_linenumber")
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    lat = F.lit(float(1 << 16))
    base = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("__p"),
        F.floor(F.col("l_quantity") * lat).cast("long").alias("__q"),
    )
    diff = F.col("__p") - F.lag("__p", 1).over(w)
    signed = (
        F.when(diff > 0, F.col("__q"))
        .when(diff < 0, -F.col("__q"))
        .otherwise(F.lit(0))
    )
    stepped = base.withColumn("__s", signed)
    return stepped.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "ship_date",
        (F.sum("__s").over(run).cast("double") / lat).alias("obv"),
    )


def stochastic_oscillator(
    lineitem: DataFrame, periods: int = 14
) -> DataFrame:
    """Stochastic oscillator %K per part series: where the current
    price sits inside its trailing ``periods``-row [low, high] range —
    %K = (p − min_n) / (max_n − min_n), the classic overbought/
    oversold gauge that completes the RSI/Bollinger/ATR family.

    Exact by construction: trailing MIN/MAX pick existing double
    values (no accumulation at all — order-free), so the numerator and
    denominator are differences of identical doubles on both engines
    and %K is one division; a flat window (max = min) emits NULL
    identically. One part-keyed exchange shared by both extremes.
    """
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("ship_date", "l_orderkey", "l_linenumber")
        .rowsBetween(-(periods - 1), 0)
    )
    base = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        F.col("l_extendedprice").alias("price"),
    )
    lo = F.min("price").over(w)
    hi = F.max("price").over(w)
    k = F.when(hi > lo, (F.col("price") - lo) / (hi - lo)).otherwise(
        F.lit(None).cast("double")
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "ship_date",
        "price",
        lo.alias("low_n"),
        hi.alias("high_n"),
        k.alias("pct_k"),
    )
