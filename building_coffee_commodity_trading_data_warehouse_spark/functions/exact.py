"""Order-independent (exact) floating aggregation helpers.

Why: Spark and the DuckDB oracle sum doubles in different orders (Spark
partial-aggregates per partition; DuckDB windowed aggregates use a
segment tree), so ``SUM(double)`` differs in the last bits between
engines — enough to break a value-hash comparison, and enough to make
results nondeterministic across cluster layouts at 100 TB.

Fix: cast each addend to ``DECIMAL(38, s)`` *before* summing. Decimal
addition is exact and associative, so the result is bit-identical
regardless of partitioning / addition order, on any engine. Per-row
double arithmetic (e.g. ``price * (1-discount)``) is IEEE-deterministic
and safe to do before the cast. The final result is cast back to DOUBLE
so both engines report the same schema.

This is also the right call at scale: a 100 TB sum of doubles drifts by
addition order between runs; decimal accumulation makes reruns
reproducible for free (Spark's decimal sum is still a JVM codegen'd
partial aggregate — no UDF, no slow path).

Cross-engine hazard (measured): DuckDB's direct DECIMAL→DOUBLE cast is
NOT correctly rounded once the decimal's integer representation needs
more than 53 bits (int128→double converts in two halves, rounding
twice — 1 ulp drift vs Spark's BigDecimal cast and vs strtod). Gates
whose DECIMAL(38,6) totals could exceed ~9e15 in scaled units must
route the ORACLE's conversion through VARCHAR
(``CAST(CAST(x AS VARCHAR) AS DOUBLE)``) — see the s_embedding_dimstats
oracle. At sf0.01 the warehouse sums peak ~3.2e15 scaled, inside the
exact range, so ``sql_dsum`` stays on the direct cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Exact sum of a double column: identical on Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum-based average (sum is order-independent; the single
    final division is IEEE-deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
