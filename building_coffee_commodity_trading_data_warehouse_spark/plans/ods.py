"""ODS star-schema fact build (E3, reference ODS.py:56-114) on the
domain shape — the pipeline a reference user actually runs.

Input: a ``stg_quotes`` staging table (contract, mo, last, change,
prev_open, high, low, prev, volume, oi, timing, snapshot_date — the
column list of ODS.py:59-80) plus two dims: ``ods_date(date_id,
date_actual)`` and ``ods_contract(contract_id, contract_code)``.

One lazy plan replaces the reference's Postgres window SQL + three
pandas merges + COPY: windowed analytics (W1-W5) → broadcast dim
joins, the contract dim role-played twice (J3) → 16-column fact
projection with nullable prev_contract_id (ODS.py:41,113) →
date-partitioned overwrite.

Scale: two window shuffles (by mo, by snapshot_date) — the same keys
Postgres sorted on; dims broadcast (date ~10^3 rows, contract ~10^1),
so the fact never shuffles for the joins; output partitioned by
date_id keeps incremental rebuilds partition-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FACT_COLUMNS = (
    "date_id",
    "contract_id",
    "prev_contract_id",
    "prev_open",
    "prev",
    "mo",
    "last",
    "prev_last",
    "change",
    "high",
    "low",
    "volume",
    "oi",
    "spread",
    "ma_200",
    "ma_50",
)


def windowed_quotes(stg_quotes: DataFrame) -> DataFrame:
    """The flagship window statement (ODS.py:59-80) on the domain
    columns. ``lag(col, -1)`` in the reference ≡ ``lead(col, 1)``:
    'prev_contract' is really the NEXT contract in the mo-series."""
    from ..operators.windows import with_trailing_means

    last_d = F.col("last").cast("double")
    w_mo = Window.partitionBy("mo").orderBy("snapshot_date")
    w_day = Window.partitionBy("snapshot_date").orderBy(
        F.col("mo").cast("int").desc()
    )
    base = stg_quotes.select(
        F.col("snapshot_date").alias("date_actual"),
        "contract",
        F.coalesce(
            F.lead(F.col("contract").cast("string"), 1).over(w_mo), F.lit("NaN")
        ).alias("prev_contract"),
        F.col("mo").cast("int").alias("mo_int"),
        F.col("mo"),
        last_d.alias("last"),
        F.lead(last_d, 1).over(w_mo).alias("prev_last"),
        "change",
        "prev_open",
        "high",
        "low",
        "prev",
        F.col("volume").cast("long").alias("volume"),
        F.col("oi").cast("long").alias("oi"),
        F.col("snapshot_date"),
    )
    # prefix-sum trailing means (see with_trailing_means): O(n), exact.
    # The w_day spread is computed AFTER all w_mo windows so the plan
    # needs only two exchanges (mo, then snapshot_date), not three.
    out = with_trailing_means(base, "last", w_mo, (200, 50)).withColumn(
        "spread",
        F.round(F.col("last") - F.lag(F.col("last"), 1).over(w_day), 2),
    )
    return out.select(
        "date_actual",
        "contract",
        "prev_contract",
        F.col("mo_int").alias("mo"),
        "last",
        "prev_last",
        "change",
        "prev_open",
        "high",
        "low",
        "prev",
        "volume",
        "oi",
        "spread",
        "ma_200",
        "ma_50",
    )


def build_fact(
    stg_quotes: DataFrame, ods_date: DataFrame, ods_contract: DataFrame
) -> DataFrame:
    """Windowed staging → dims → 16-column fact (ODS.py:103-113).

    The contract dim is joined twice (role-playing, J3): once for the
    current contract, once — re-keyed as prev_contract_code — for the
    next-in-series contract; the edge row's 'NaN' sentinel misses the
    dim so prev_contract_id is NULL there (nullable Int64 semantics,
    ODS.py:113)."""
    q = windowed_quotes(stg_quotes)
    dim_date = F.broadcast(ods_date.select("date_actual", "date_id"))
    dim_cur = F.broadcast(
        ods_contract.select(
            F.col("contract_id"), F.col("contract_code").alias("contract")
        )
    )
    dim_prev = F.broadcast(
        ods_contract.select(
            F.col("contract_id").alias("prev_contract_id"),
            F.col("contract_code").alias("prev_contract"),
        )
    )
    return (
        q.join(dim_date, "date_actual", "left")
        .join(dim_cur, "contract", "left")
        .join(dim_prev, "prev_contract", "left")
        .select(*FACT_COLUMNS)
    )


def date_dim(spark, start: str, end: str) -> DataFrame:
    """Generate the ``ods_date`` dimension the fact build consumes
    (reference ODS.py:57,96-105 SELECTs a pre-existing ``ods_date``
    and joins snapshot_date → date_id; this is the missing producer) —
    a Kimball calendar: smart yyyymmdd surrogate key plus the
    year/quarter/month/week/day attributes BI slices on.

    Shape: ``spark.range`` over the day count — generated in parallel
    straight into the executors, ZERO shuffle, no driver-side list;
    every attribute is a codegen date function of the one generated
    column. A century is ~36k rows, so the dim broadcasts into every
    fact join (build_fact) at any corpus scale. Week fields are ISO
    (Spark ``weekofyear``; day-of-week renumbered Monday=1) so they
    agree across engines and with the warehouse convention."""
    import datetime as _dt

    d0 = _dt.date.fromisoformat(start)
    n_days = (_dt.date.fromisoformat(end) - d0).days + 1
    if n_days <= 0:
        raise ValueError(f"empty calendar range {start}..{end}")
    d = F.date_add(F.to_date(F.lit(start)), F.col("id").cast("int"))
    iso_dow = ((F.dayofweek(d) + 5) % 7) + 1  # Monday=1 .. Sunday=7
    return spark.range(n_days).select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("date_id"),
        d.alias("date_actual"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofmonth(d).alias("day"),
        F.dayofyear(d).alias("day_of_year"),
        iso_dow.alias("iso_dow"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.weekofyear(d).alias("iso_week"),
        (iso_dow >= 6).alias("is_weekend"),
        F.trunc(d, "MM").alias("first_day_of_month"),
        F.last_day(d).alias("last_day_of_month"),
        F.datediff(d, F.to_date(F.lit("1970-01-01"))).alias("epoch_day"),
    )


def load_fact(fact: DataFrame, path: str) -> None:
    """S10 — atomic replace of the fact table, date-partitioned so the
    commented-out incremental predicates of the reference (ODS.py:38,81)
    become partition pruning."""
    fact.write.mode("overwrite").partitionBy("date_id").parquet(path)
