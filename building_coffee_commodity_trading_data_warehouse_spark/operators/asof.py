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

_SIDE = "__asof_side"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every ``left`` row, attach the ``right``
    row with the greatest ``right_ts`` <= ``left_ts`` within the same
    ``on`` key (ties on ``right_ts`` broken by the greatest ``tiebreak``).

    Returns all of ``left``'s columns plus, for each ``c`` in
    ``value_cols``, a column ``c + suffix`` (NULL when no right row
    precedes), plus ``right_ts + suffix`` — the matched quote time.

    Plan shape: union the two sides, then one window pass
    ``last(value, ignorenulls=True)`` ordered by (ts, side, tiebreak)
    with right rows sorting BEFORE left rows at equal ts, so an exactly
    simultaneous quote is visible to the trade (<= semantics). A single
    hash partitioning on ``on`` serves the whole plan; at 100 TB the
    sort is the only cost and it is per-key local. Skewed keys can be
    pre-split by coarse time-bucket since only intra-bucket state (the
    last fill of the previous bucket) crosses the boundary.
    """
    tiebreak = tiebreak or right_ts
    fill_cols = list(value_cols) + [right_ts]
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias(_TIE),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
            for c in fill_cols
        ],
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
        *[F.col(c).alias(c + suffix) for c in fill_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts), F.col(_SIDE), F.col(_TIE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        F.col(_SIDE),
        *[F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix) for c in fill_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)


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
