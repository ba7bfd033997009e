"""JDBC table source (S7, reference STG.py:71,100 / ODS.py:83-99).

The reference reads staging and dimension tables over psycopg2; the
Spark-native equivalent is ``spark.read.jdbc`` with predicate-based
parallelism. In the primary architecture these tables live as parquet
in the catalog (catalog.py) — JDBC is the migration edge for pulling a
reference user's existing Postgres warehouse across.

The read path is exercised END TO END against embedded Apache Derby
(the JDBC database that ships inside Spark's own jars — no external
server needed): gate e_jdbc_roundtrip writes a table over JDBC, reads
it back with partitioned range queries, and value-matches the source.
Postgres et al. differ only in url/driver strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC scan; when a numeric ``partition_column`` + bounds are
    given, Spark issues ``num_partitions`` bounded range queries in
    parallel instead of one giant serial cursor — the difference
    between a usable and an unusable 100 GB table pull."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def partition_bounds(n_rows: int, num_partitions: int) -> list[tuple[int, int]]:
    """Even row-id ranges for manual predicate partitioning (when the
    key isn't numeric): [(lo, hi)) pairs covering [0, n_rows)."""
    step = max(1, (n_rows + num_partitions - 1) // num_partitions)
    return [(i, min(i + step, n_rows)) for i in range(0, n_rows, step)]


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(path: str, create: bool = True) -> str:
    """Embedded-Derby JDBC url rooted at ``path`` — the zero-install
    database Spark's own classpath provides, used to integration-test
    the JDBC source/sink path for real."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{path}{suffix}"


def write_table(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options: str
) -> None:
    """JDBC sink (the migration edge in the other direction): plain
    INSERTs through the driver, executor-parallel — each partition
    opens its own connection. For 100 TB-scale exports prefer the
    warehouse's native bulk loader; this is the correctness path."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
