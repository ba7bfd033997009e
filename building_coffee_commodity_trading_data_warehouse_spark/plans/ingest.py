"""Ingestion plans: the reference's staging lifecycle (E1, STG.py
__main__ → insert_into_staging) as lazy Spark plans over parquet.

Sinks (SURVEY.md §2.1):
  S9/S10  truncate-and-reload → atomic ``mode("overwrite")`` parquet
          write; facts are DATE-PARTITIONED on write so the reference's
          commented incremental predicates (ODS.py:38,81) become
          partition pruning instead of full rescans.
  S11     append → ``mode("append")``.
  J4      dedup-merge upsert (STG.py:102-115) → operators/joins.py
          ``merge_upsert`` materialized with overwrite.

Audit (§5.1, STG.py:133-164): every load emits one reconciliation row
(source count vs loaded count + duration) appended to an audit table —
the reference's de-facto correctness check, kept as a first-class
operator.

Scale posture: counts are the only driver-visible values (one long
each); writes are executor-side; a 100 TB merge touches only the
partitions holding matched keys when the target is date-partitioned.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import merge_upsert

AUDIT_COLUMNS = (
    "script",
    "source_name",
    "target_name",
    "source_row",
    "target_row",
    "duration_sec",
    "snapshot_date",
    "created_date",
    "created_by",
)


def truncate_reload(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """S9/S10 — full replace of a table. Parquet overwrite is atomic at
    the directory level (the reference wrapped DELETE+COPY in one
    transaction with rollback, ODS.py:34-51)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def append(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """S11 — INSERT INTO ... SELECT."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def _delete_partition_dir(
    spark: SparkSession, target_path: str, partition_by: str, value: str
) -> None:
    """Drop one hive-style partition directory (``col=value``). Used for
    partitions emptied by a cross-partition key delete, which dynamic
    overwrite cannot remove (it only replaces partitions present in the
    written data). Values with characters Spark escapes in directory
    names (rare for date/int partition columns) are not handled."""
    jsc = spark.sparkContext._jsc
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{partition_by}={value}")
    fs = p.getFileSystem(jsc.hadoopConfiguration())
    fs.delete(p, True)


def merge_into(
    spark: SparkSession,
    target_path: str,
    staged: DataFrame,
    keys: list[str],
    partition_by: str | None = None,
) -> None:
    """J4 materialized: read target, anti-join + union, overwrite.
    Missing target = first load (bootstrap append). The staged plan is
    evaluated once; rerunning with the same snapshot is a no-op on
    content (reference idempotency, STG.py:102-115).

    PARTITIONED targets merge at partition granularity: partitions the
    staged snapshot touches are read back, merged, and rewritten
    (``partitionOverwriteMode=dynamic``) — on a 100 TB date-partitioned
    fact a daily snapshot rewrites one day, not the table. Key semantics
    stay GLOBAL like the reference's DELETE WHERE EXISTS (STG.py:102-115):
    a staged key living in a partition the snapshot does NOT touch (the
    record's partition value changed) is found by a column-pruned probe
    of (keys, partition) against the broadcast staged keys, and its
    partition is rewritten too — no stale duplicate survives. A stale
    partition emptied by that delete writes no rows under dynamic
    overwrite, so its directory is dropped explicitly. Unpartitioned
    targets fall back to a full materialize+swap (the merged plan reads
    the path it overwrites, so it must be materialized first — Delta's
    MERGE would remove that copy)."""
    try:
        target = spark.read.parquet(target_path)
    except Exception:
        truncate_reload(staged, target_path, partition_by)
        return
    if partition_by:
        touched = staged.select(partition_by).distinct()
        staged_keys = staged.select(*keys).distinct()
        stale = (
            target.join(F.broadcast(touched), partition_by, "left_anti")
            .join(F.broadcast(staged_keys), keys, "left_semi")
            .select(partition_by)
            .distinct()
        )
        parts = touched.unionByName(stale).distinct()
        part_vals = [str(r[0]) for r in parts.collect()]  # bounded: partition count
        affected = target.join(F.broadcast(parts), partition_by, "left_semi")
        merged = merge_upsert(affected, staged, keys).localCheckpoint(eager=True)
        out_vals = {
            str(r[0]) for r in merged.select(partition_by).distinct().collect()
        }
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(partition_by).parquet(
                target_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        for v in part_vals:
            if v not in out_vals:
                _delete_partition_dir(spark, target_path, partition_by, v)
        return
    merged = merge_upsert(target, staged, keys).localCheckpoint(eager=True)
    truncate_reload(merged, target_path, partition_by)


@dataclass
class LoadReport:
    script: str
    source_name: str
    target_name: str
    source_row: int
    target_row: int
    duration_sec: float
    snapshot_date: str


def load_with_audit(
    spark: SparkSession,
    staged: DataFrame,
    target_path: str,
    keys: list[str] | None,
    script: str,
    source_name: str,
    target_name: str,
    snapshot_date: str,
    partition_by: str | None = None,
) -> LoadReport:
    """E1 end-to-end: stage → (merge | reload) → reconcile counts.
    Mirrors insert_into_staging + checking_logs (STG.py:84-164)."""
    t0 = time.monotonic()
    source_row = staged.count()
    if keys:
        merge_into(spark, target_path, staged, keys, partition_by)
    else:
        truncate_reload(staged, target_path, partition_by)
    target_row = spark.read.parquet(target_path).count()
    return LoadReport(
        script=script,
        source_name=source_name,
        target_name=target_name,
        source_row=source_row,
        target_row=target_row,
        duration_sec=round(time.monotonic() - t0, 3),
        snapshot_date=snapshot_date,
    )


def audit_append(spark: SparkSession, report: LoadReport, audit_path: str, created_by: str = "spark") -> None:
    """stg_checking_logs row (STG.py:143-161) appended to the audit
    table."""
    # one-row frame via spark.range + lit (pure JVM): createDataFrame
    # from a local list routes through a Python RDD whose worker
    # spin-up costs seconds per call in this runtime (measured r12 on
    # the near-dup index sidecars — same fix).
    row = spark.range(1).select(
        F.lit(report.script).cast("string").alias("script"),
        F.lit(report.source_name).cast("string").alias("source_name"),
        F.lit(report.target_name).cast("string").alias("target_name"),
        F.lit(report.source_row).cast("long").alias("source_row"),
        F.lit(report.target_row).cast("long").alias("target_row"),
        F.lit(report.duration_sec).cast("double").alias("duration_sec"),
        F.lit(report.snapshot_date).cast("string").alias("snapshot_date"),
    ).select(
        "*",
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("created_date"),
        F.lit(created_by).alias("created_by"),
    )
    append(row, audit_path)


def write_bucketed(
    df,
    table: str,
    keys: list[str],
    buckets: int = 32,
    sorted_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Co-located join layout: hash-bucket (and sort) the table on its
    join/aggregation keys so every later equi-join or groupBy on those
    keys reads pre-partitioned data and skips its Exchange entirely —
    the bucketing answer to "co-locate joins via pre-partitioning".

    At 100 TB this is the difference between re-shuffling the fact
    table on every query and shuffling it ONCE at write time: two
    tables bucketed on the same keys with the same bucket count
    sort-merge-join with zero Exchange on either side (pinned by
    tests/test_plan_shapes.py). Bucket count bounds per-bucket file
    size; sorting inside buckets makes the merge phase stream."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*(sorted_by or keys))
    )
    if path is not None:
        # external table at an explicit location — callers that cannot
        # rely on a writable spark.sql.warehouse.dir (the session's cwd
        # by default) pass their own workdir
        w = w.option("path", path)
    w.saveAsTable(table)
