"""Table catalog over the driver-generated parquet star schema.

The reference keeps its catalog in two Postgres databases (stg + ods,
ODS.py:19-26) plus a source-registry table ``stg_meta_data``
(STG.py:67-76). Here the catalog is a thin registry of parquet paths:
tables are columnar at rest, scans get predicate pushdown and column
pruning from the parquet datasource, and facts can be date-partitioned
on write (plans/ingest.py) so incremental predicates become partition
pruning instead of full reloads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Parquet scan → pushdown + pruning free.

    ``events.ts`` has shipped as two physical types across driver data
    generations: TIMESTAMP(NANOS) (arrives as a long under
    ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP_NTZ
    (microseconds). Either way the engine's contract is the same two
    columns: ``ts`` as instant TimestampType (session tz is pinned to
    UTC, so the NTZ cast is wall-clock-preserving) and ``ts_ns`` as an
    exact integer epoch for deterministic ordering/gap math.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so the SQL surface
    (spark.sql) sees the same catalog as the DataFrame surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
