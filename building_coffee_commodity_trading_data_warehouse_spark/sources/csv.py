"""CSV sources with the reference's sentinel-null semantics.

S1 (STG.py:84): header CSV scan; the KC=F.csv series carries the
literal string ``null`` in every non-Date column on market holidays —
``nullValue`` turns those into real NULLs at scan time so downstream
casts don't poison the column.
S2 (STG.py:86): headerless scan used only for the source row count.

Explicit schemas at the warehouse edge (SURVEY.md §1.3): inference is
allowed only for raw exploration; catalog loads declare a StructType
so a schema drift fails loudly at scan, not silently at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

OHLCV_SCHEMA = (
    "`Date` DATE, `Open` DOUBLE, `High` DOUBLE, `Low` DOUBLE, "
    "`Close` DOUBLE, `Adj Close` DOUBLE, `Volume` LONG"
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    null_value: str = "null",
) -> DataFrame:
    """S1 — header CSV with sentinel-null handling; schema optional
    (inferred) at the raw edge, explicit at the catalog edge."""
    reader = (
        spark.read.option("header", True)
        .option("nullValue", null_value)
        .option("nanValue", "NaN")
    )
    if schema is None:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_ohlcv(spark: SparkSession, path: str) -> DataFrame:
    """The KC=F.csv shape: Yahoo-Finance daily OHLCV, 'null' sentinel
    rows on holidays arrive as real NULLs."""
    return read_csv(spark, path, OHLCV_SCHEMA)


def source_row_count(spark: SparkSession, path: str, header: bool = True) -> int:
    """S2 — reconciliation count of the raw file (header excluded to
    match the loaded row count)."""
    n = spark.read.csv(path).count()
    return n - 1 if header and n > 0 else n


def write_csv_single(df: DataFrame, path: str) -> None:
    """S8 — CSV sink. The reference writes one file per dataset
    (pandas to_csv); coalesce(1) reproduces that for export parity.
    Real tables stay parquet — this sink is for interchange only."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
