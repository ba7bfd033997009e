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
    """
    files = df.inputFiles()
    total = 0
    for f in files:
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

    File count = ceil(total_bytes / target). The rewrite uses
    ``repartition(n)`` (round-robin) — a single narrow-row shuffle that
    equalizes output file sizes regardless of input skew; with
    ``partition_by`` the repartition keys on the partition column so
    each Hive partition writes its own packed files. Content is
    unchanged (tested): compaction is layout-only.
    """
    df = spark.read.parquet(src_path)
    _, total = table_file_stats(df)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if partition_by:
        from pyspark.sql import functions as F

        (
            df.repartition(n_out, F.col(partition_by))
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(dest_path)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(dest_path)
    out = spark.read.parquet(dest_path)
    n_files, _ = table_file_stats(out)
    return n_files
