"""As-of (point-in-time) join and binned range join.

Neither operator exists in the reference (SURVEY.md §2.3 notes the
reference's join surface is equi-left-joins only, ODS.py:107), but both
are table stakes for the commodity-trading domain the reference serves:
"price of the contract as of this trade's timestamp" is an as-of join,
and "which volatility band was this tick in" is a point-in-interval
range join. They are implemented Spark-first as compositions of native
operators — no UDFs, no driver-side data movement — so they hold at
100 TB:

* ``asof_join`` is the union + last-non-null-over-window formulation:
  ONE shuffle on the key columns, O(1) running state per row, and no
  row explosion — unlike the naive range-join (quadratic candidate
  pairs) or a per-key ``collect_list`` (driver/executor memory blowup).
  All matched columns travel in ONE struct filled by a single
  ``last(ignorenulls=True)``, so every output column comes from the
  SAME matched right row (a NULL value in the newest quote surfaces as
  NULL — never back-filled from an older quote).
* ``asof_join_bucketed`` is the skew escape hatch: rows pre-split by a
  coarse time bucket so the per-key sort becomes per-(key, bucket);
  only one carry row per bucket (the last quote of everything before
  it) crosses bucket boundaries, computed with a per-bucket aggregate
  plus a window over the tiny (key × bucket) relation. Identical output
  to ``asof_join`` (parity-tested), worth it only for monster keys.
* ``range_join_bins`` is the bucketed interval join: intervals are
  exploded into the fixed-width bins they cover, points hash to exactly
  one bin, and the join becomes an equi-join on the bin id followed by
  a residual ``BETWEEN`` filter — turning an O(|points|·|intervals|)
  theta-join into a co-partitioned hash join. This is the same strategy
  Databricks' range-join binning hint applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_SIDE = "__asof_side"
_TIE = "__asof_tie"
_PAY = "__asof_pay"
_BKT = "__asof_bucket"


def _payload_type(right: DataFrame, fill_cols: list[str]) -> StructType:
    return StructType(
        [StructField(c, right.schema[c].dataType) for c in fill_cols]
    )


def _tag_sides(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    fill_cols: list[str],
    tiebreak: str,
):
    """Union-ready (left, right) with the matched columns packed into a
    single struct column ``_PAY`` (NULL on left rows): one
    ``last(_PAY, ignorenulls=True)`` then yields ALL matched columns
    from the same right row — no torn rows when a value column is NULL
    in the newest quote."""
    pay_t = _payload_type(right, fill_cols)
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias(_TIE),
        F.lit(None).cast(pay_t).alias(_PAY),
    )
    r_tagged = right.select(
        *[
            (
                F.col(c)
                if c in on
                else F.col(right_ts).alias(left_ts)
                if c == left_ts
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
            )
            for c in left.columns
        ],
        F.lit(0).alias(_SIDE),
        F.col(tiebreak).alias(_TIE),
        F.struct(*[F.col(c).alias(c) for c in fill_cols]).alias(_PAY),
    )
    return l_tagged, r_tagged


def _project_matched(
    filled: DataFrame, left_cols: list[str], fill_cols: list[str], suffix: str
) -> DataFrame:
    return filled.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        *[F.col(_PAY)[c].alias(c + suffix) for c in fill_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction='backward'`` (default): for every
    ``left`` row, attach the ``right`` row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (ties on
    ``right_ts`` broken by the greatest ``tiebreak``).
    ``direction='forward'``: the mirror — smallest ``right_ts`` >=
    ``left_ts`` (ties broken by the SMALLEST ``tiebreak``).
    ``direction='nearest'``: whichever of the two is closer in
    absolute time; an exact tie prefers backward (pandas
    ``merge_asof`` semantics, empirically pinned in tests). Exact-ts
    matches are visible to every direction.

    Returns all of ``left``'s columns plus, for each ``c`` in
    ``value_cols``, a column ``c + suffix`` (NULL when no right row
    precedes), plus ``right_ts + suffix`` — the matched quote time. All
    ``+ suffix`` columns come from the SAME matched right row (LATERAL
    top-1 semantics).

    Plan shape: union the two sides, then one window pass
    ``last(struct, ignorenulls=True)`` ordered by (ts, side, tiebreak)
    with right rows sorting BEFORE left rows at equal ts, so an exactly
    simultaneous quote is visible to the trade (<= semantics). A single
    hash partitioning on ``on`` serves the whole plan; at 100 TB the
    sort is the only cost and it is per-key local. For monster keys use
    ``asof_join_bucketed``.

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``
    tolerance): a match further than the bound (in the match's own
    direction) is rejected — the row survives with NULL matched
    columns (an expired quote must not price a trade). Applied AFTER
    the window fill as a pure projection — the plan shape is
    unchanged.

    Plan shape per direction: 'backward'/'forward' are one window pass
    each; 'nearest' stacks the two window specs over the SAME
    partitioning (one Exchange on ``on``, two local sorts) and picks
    per row with a null-safe projection.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    tiebreak = tiebreak or right_ts
    fill_cols = list(value_cols) + [right_ts]
    pay_t = _payload_type(right, fill_cols)
    l_tagged, r_tagged = _tag_sides(
        left, right, on, left_ts, right_ts, fill_cols, tiebreak
    )
    unioned = l_tagged.unionByName(r_tagged)

    # unix_micros over a timestamp cast works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (a direct numeric cast of NTZ is rejected
    # by the analyzer); both sides convert identically, so the
    # session-tz interpretation cancels in the difference.
    def _micros(c):
        return F.unix_micros(c.cast("timestamp"))

    # backward: right rows sort BEFORE left at equal ts (side 0 < 1),
    # so an exactly simultaneous quote is inside the trailing frame.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts), F.col(_SIDE), F.col(_TIE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left rows sort BEFORE right at equal ts (side desc), so
    # the simultaneous quote is inside the leading frame; _TIE asc
    # makes the first match the smallest tiebreak.
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts), F.col(_SIDE).desc(), F.col(_TIE))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _bounded(pay, delta_from, delta_to):
        """NULL out a fill whose (direction-signed) staleness exceeds
        the tolerance. delta = delta_from - delta_to in micros."""
        if tolerance_seconds is None:
            return pay
        stale = (_micros(delta_from) - _micros(delta_to)) > float(
            tolerance_seconds
        ) * 1e6
        return F.when(stale, F.lit(None).cast(pay_t)).otherwise(pay)

    if direction == "nearest":
        staged = unioned.select(
            *left.columns,
            F.col(_SIDE),
            F.last(_PAY, ignorenulls=True).over(w_back).alias("__pay_b"),
            F.first(_PAY, ignorenulls=True).over(w_fwd).alias("__pay_f"),
        ).select(
            *left.columns,
            F.col(_SIDE),
            _bounded(
                F.col("__pay_b"), F.col(left_ts), F.col("__pay_b")[right_ts]
            ).alias("__pay_b"),
            _bounded(
                F.col("__pay_f"), F.col("__pay_f")[right_ts], F.col(left_ts)
            ).alias("__pay_f"),
        )
        db = _micros(F.col(left_ts)) - _micros(F.col("__pay_b")[right_ts])
        df_ = _micros(F.col("__pay_f")[right_ts]) - _micros(F.col(left_ts))
        pay = (
            F.when(F.col("__pay_b").isNull(), F.col("__pay_f"))
            .when(F.col("__pay_f").isNull(), F.col("__pay_b"))
            # exact tie prefers backward (pandas merge_asof)
            .when(df_ < db, F.col("__pay_f"))
            .otherwise(F.col("__pay_b"))
        )
        filled = staged.select(*left.columns, F.col(_SIDE), pay.alias(_PAY))
    elif direction == "backward":
        base = F.last(_PAY, ignorenulls=True).over(w_back)
        filled = unioned.select(
            *left.columns,
            F.col(_SIDE),
            _bounded(base, F.col(left_ts), base[right_ts]).alias(_PAY),
        )
    else:  # forward
        base = F.first(_PAY, ignorenulls=True).over(w_fwd)
        filled = unioned.select(
            *left.columns,
            F.col(_SIDE),
            _bounded(base, base[right_ts], F.col(left_ts)).alias(_PAY),
        )
    return _project_matched(filled, left.columns, fill_cols, suffix)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """``asof_join`` with the per-key sort pre-split by a coarse time
    bucket — the skew escape hatch for keys whose row count exceeds one
    task's comfort (a single instrument holding a large share of 100 TB
    of ticks would otherwise serialize into one sort).

    Mechanics: rows hash-partition on (key, floor(ts / bucket)) so each
    sort covers one bucket of one key. Cross-bucket state is exactly one
    row per bucket — the most recent quote strictly before the bucket —
    computed as a per-(key, bucket) ``max_by`` aggregate chained through
    a window over the (key × bucket) relation (negligible cardinality),
    then injected into each bucket as a synthetic quote that sorts first
    (its timestamp is strictly below the bucket's range). Output is
    IDENTICAL to ``asof_join`` (parity-tested in tests/test_asof_range.py);
    the extra cost is one small aggregate + one extra shuffle, so use it
    only when key skew is real.
    """
    tiebreak = tiebreak or right_ts
    fill_cols = list(value_cols) + [right_ts]
    l_tagged, r_tagged = _tag_sides(
        left, right, on, left_ts, right_ts, fill_cols, tiebreak
    )
    bucket = F.floor(F.unix_timestamp(F.col(left_ts)) / F.lit(bucket_seconds))
    l_b = l_tagged.withColumn(_BKT, bucket)
    r_b = r_tagged.withColumn(_BKT, bucket)

    # carry chain: last quote payload of each (key, bucket), laddered to
    # "last quote of any EARLIER bucket" over the tiny bucket relation
    order = F.struct(F.col(left_ts), F.col(_TIE))
    last_in_bucket = r_b.groupBy(*on, _BKT).agg(
        F.max_by(F.col(_PAY), order).alias("__blast")
    )
    all_buckets = (
        l_b.select(*on, _BKT).union(r_b.select(*on, _BKT)).distinct()
    )
    w_chain = (
        Window.partitionBy(*on)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(last_in_bucket, [*on, _BKT], "left")
        .select(
            *on,
            _BKT,
            F.last("__blast", ignorenulls=True).over(w_chain).alias(_PAY),
        )
        .filter(F.col(_PAY).isNotNull())
    )
    # synthetic right row per bucket: the carried quote, entering the
    # bucket with its ORIGINAL timestamp (strictly below the bucket's
    # ts range, so it sorts first without an extra ordering column)
    carry_rows = carry.select(
        *[
            (
                F.col(c)
                if c in on
                else F.col(_PAY)[right_ts].alias(left_ts)
                if c == left_ts
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
            )
            for c in left.columns
        ],
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias(_TIE),
        F.col(_PAY),
        F.col(_BKT),
    )
    w = (
        Window.partitionBy(*on, _BKT)
        .orderBy(F.col(left_ts), F.col(_SIDE), F.col(_TIE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_b.unionByName(r_b)
        .unionByName(carry_rows)
        .select(
            *left.columns,
            F.col(_SIDE),
            F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
        )
    )
    return _project_matched(filled, left.columns, fill_cols, suffix)


def _bin(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def range_join_bins(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (``lo <= point <= hi``, both inclusive)
    without a cross product: each interval is exploded into the
    fixed-width bins it covers, each point falls in exactly one bin,
    and the match becomes ``equi-join on bin`` + residual BETWEEN
    filter. A qualifying (point, interval) pair meets in exactly one
    bin, so no distinct pass is needed. Intervals may overlap — a point
    inside k intervals yields k output rows, true theta-join semantics.

    Pick ``bin_width`` near the median interval width: too small
    explodes the interval side (hi-lo)/width ×, too large degrades
    selectivity of the residual filter. At 100 TB the join is a plain
    co-partitioned hash join on the bin id — AQE handles per-bin skew.
    """
    p = points.withColumn("__bin", _bin(F.col(point_col), bin_width))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(lo_col), bin_width), _bin(F.col(hi_col), bin_width))
        ),
    )
    joined = p.join(iv, "__bin", how).filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop("__bin")
