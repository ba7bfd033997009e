"""Table maintenance: small-file compaction.

A 100 TB table ingested by streaming micro-batches or partitioned
merges (plans/ingest.py) accumulates small parquet files; every
downstream scan then pays per-file open/footer costs and the scheduler
drowns in splits. Compaction is the OPTIMIZE-style rewrite: bin-pack
row groups back to target-sized files, content unchanged.

The reference never needs this (its tables live in Postgres), but any
parquet-at-rest deployment of this engine does — it is the operational
twin of the ingestion path.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(df: DataFrame) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet files behind a scan.
    Driver-side listing of FILE METADATA only (paths + sizes — never
    data); at 100 TB this is the same listing the planner already does.

    Local-scheme only: on ``s3://``/``hdfs://`` paths ``os.path.getsize``
    can't stat the object, and silently summing 0 would make
    ``compact_table`` collapse the whole table into ONE file — so any
    non-``file:`` scheme raises instead (swap point: Hadoop
    ``FileSystem.listStatus`` via the JVM gateway).
    """
    files = df.inputFiles()
    total = 0
    for f in files:
        if "://" in f and not f.startswith("file:"):
            raise NotImplementedError(
                f"table_file_stats: non-local scheme in {f!r}; wire the "
                "Hadoop FileSystem listing here before compacting remote "
                "tables"
            )
        p = f.removeprefix("file:")
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return len(files), total


def compact_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: str | None = None,
) -> int:
    """Rewrite ``src_path`` into ``dest_path`` with files bin-packed to
    ``target_file_bytes``. Returns the output file count.

    File count = ceil(total_bytes / target). Unpartitioned: one
    round-robin ``repartition(n_out)`` equalizes output sizes regardless
    of input skew. Partitioned: hashing on the partition column ALONE
    would put each Hive partition's rows in one shuffle partition — an
    oversized partition would still write one oversized file. Instead the
    repartition keys on (partition column, salt) where salt =
    ``pmod(xxhash64(monotonically_increasing_id()), files_per_partition)``,
    so a partition holding K× the target bytes fans out across ~K packed
    files while small partitions stay at 1. Content is unchanged
    (tested): compaction is layout-only.
    """
    df = spark.read.parquet(src_path)
    _, total = table_file_stats(df)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if partition_by:
        from pyspark.sql import functions as F

        n_parts = df.select(partition_by).distinct().count()
        files_per_partition = max(1, math.ceil(n_out / max(1, n_parts)))
        salt = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()),
            F.lit(files_per_partition),
        )
        (
            df.withColumn("__salt", salt)
            .repartition(n_out, F.col(partition_by), F.col("__salt"))
            .drop("__salt")
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(dest_path)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(dest_path)
    out = spark.read.parquet(dest_path)
    n_files, _ = table_file_stats(out)
    return n_files
