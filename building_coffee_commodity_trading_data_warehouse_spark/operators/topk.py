"""Sorts / limits / top-k (SURVEY.md §2.6).

The reference only sorts inside window frames and for output parity;
the engine exposes the general shapes: global order, top-k per group
via row_number (rank shuffle = one hash partition by group, no global
sort), and deterministic tiebreaks so results are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders per priority by total price. Tiebreak on the
    unique key so ranking is deterministic on any engine/partitioning."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= k)
    )


def ordered_output(df: DataFrame, *cols: str) -> DataFrame:
    """Global sort for output parity (golden CSVs are date-ordered).
    Range-partitioned sort: samples boundaries, no single-node funnel."""
    return df.orderBy(*cols)
