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

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as a long. Expose both: ``ts_ns`` (exact, for deterministic
    ordering/gap math) and ``ts`` (microsecond TimestampType).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so the SQL surface
    (spark.sql) sees the same catalog as the DataFrame surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
