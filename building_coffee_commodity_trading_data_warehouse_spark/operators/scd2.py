"""Slowly-changing-dimension type-2 surface: change-capture compaction
and point-in-time lookup.

The reference keeps its dims type-1 (full truncate-reload, STG.py
drop/replace; ODS.py:103 joins the latest snapshot only) — history is
lost on every load. SCD2 is the standard warehouse answer: each key
carries versioned validity intervals, and a fact row joins the version
whose interval covers its timestamp. Built here from the event log the
same way a CDC stream would be compacted.

Scale:
  * ``scd2_compact`` is one exchange on the dimension key; both window
    passes (change detection, then interval close + versioning) stack
    on the SAME partitioning, so Catalyst plans a single shuffle.
  * Dimension history stays per-key sorted — no global sort.
  * Point-in-time lookup is the as-of join (operators/asof.py), which
    already has a skew-bucketed variant; SCD2 adds nothing new at the
    physical layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 00:00:00.000000"
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def scd2_compact(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Compact an append-only change log into SCD2 validity intervals.

    A row opens a new version iff its attribute differs from the
    previous row's (per key, time-ordered with a unique tiebreak —
    consecutive duplicates are no-op updates and collapse away).
    ``valid_to`` is the next version's ``valid_from``; the latest
    version stays open (sentinel 9999-12-31) and is flagged
    ``is_current``. ``version`` numbers the key's history from 1.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        events.select(key_col, ts_col, tiebreak_col, attr_col)
        .withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col(attr_col) != F.col("__prev")))
    )
    # same key partitioning + ordering as `w` → reuses the exchange
    wv = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(ts_col).over(wv)
    return changed.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.date_format(ts_col, TS_FMT).alias("valid_from"),
        F.coalesce(F.date_format(nxt, TS_FMT), F.lit(OPEN_END)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(wv).cast("int").alias("version"),
    )


def scd2_current(dim: DataFrame) -> DataFrame:
    """Type-1 view of an SCD2 dim: current versions only (a filter —
    no shuffle; the reference's latest-snapshot join, ODS.py:103)."""
    return dim.filter(F.col("is_current"))
