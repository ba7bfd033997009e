"""Physical-plan probes: assert the plan we want, not just the answer.

Used by tests to pin the scale-critical properties (SURVEY.md §4):
filters reach the parquet scan, projections prune the read schema,
small dims broadcast, window/agg exchanges are on the declared keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True iff the parquet scan advertises a pushed filter containing
    ``fragment`` (e.g. a column name)."""
    plan = plan_string(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line.split("PushedFilters", 1)[1]:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the scan actually reads (pruning check)."""
    import re

    plan = plan_string(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip())
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    return plan_string(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (pre-AQE)."""
    return plan_string(df).count("Exchange hashpartitioning") + plan_string(df).count(
        "Exchange rangepartitioning"
    )
