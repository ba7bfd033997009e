"""Snapshot-versioned tables (time travel) — the warehouse capability
the reference's truncate-and-reload scripts (STG.py/ODS.py full
reloads) lack: every write becomes an immutable version, reads pin any
historical version, and retention is an explicit vacuum — the same
contract Delta/Iceberg give, built on plain parquet + a manifest, so
it runs anywhere this engine runs.

Layout:
    <table>/_versions/v=N/   immutable parquet snapshot N
    <table>/_manifest.json   {"current": N, "versions": {N: row_count}}

Scale posture:
  * a snapshot write is one parquet write of the incoming frame — no
    rewrite of history, no copy-on-write amplification; version dirs
    are independent so writers never touch readers' files;
  * the manifest is O(#versions) bytes of driver-side JSON (atomic
    rename publish) — never data-sized;
  * read_version is a plain parquet scan of one version dir: all
    pushdown/pruning applies untouched;
  * vacuum removes whole version directories — no file-level
    liveness tracking needed because versions never share files.

Single-writer semantics (like the reference's batch loads): the
manifest publish is last-writer-wins; concurrent writers need a
catalog with CAS, which is out of scope for a parquet-native engine.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(table: str) -> str:
    return os.path.join(table, "_manifest.json")


def _read_manifest(table: str) -> dict:
    p = _manifest_path(table)
    if not os.path.exists(p):
        return {"current": -1, "versions": {}}
    with open(p) as f:
        return json.load(f)


def _publish(table: str, manifest: dict) -> None:
    tmp = _manifest_path(table) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table))  # atomic publish


def _max_version_dir(table: str) -> int:
    """Highest v=N directory on disk, published or orphaned (-1 if
    none) — orphans from crashed writes must not collide with the
    next write."""
    vroot = os.path.join(table, "_versions")
    if not os.path.isdir(vroot):
        return -1
    vs = [
        int(d[2:])
        for d in os.listdir(vroot)
        if d.startswith("v=") and d[2:].isdigit()
    ]
    return max(vs, default=-1)


def write_snapshot(df: DataFrame, table: str) -> int:
    """Write ``df`` as the next immutable version; returns its id.
    The data lands fully before the manifest flips — a crashed write
    leaves an orphan dir (removable by vacuum), never a torn table.
    The next id skips past any orphan directory, so a crashed write
    never blocks subsequent writes (they would otherwise collide with
    mode('errorifexists') forever)."""
    m = _read_manifest(table)
    v = max(int(m["current"]), _max_version_dir(table)) + 1
    path = os.path.join(table, "_versions", f"v={v}")
    df.write.mode("errorifexists").parquet(path)
    n = df.sparkSession.read.parquet(path).count()
    m["current"] = v
    m["versions"][str(v)] = n
    _publish(table, m)
    return v


def read_version(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Read the table at ``version`` (default: current). Historical
    reads are plain parquet scans — pushdown and pruning intact."""
    m = _read_manifest(table)
    v = int(m["current"]) if version is None else int(version)
    if str(v) not in m["versions"]:
        raise ValueError(f"version {v} not in {sorted(m['versions'])}")
    return spark.read.parquet(os.path.join(table, "_versions", f"v={v}"))


def history(table: str) -> list[tuple[int, int]]:
    """[(version, row_count)] oldest→newest — the audit trail."""
    m = _read_manifest(table)
    return sorted((int(k), int(n)) for k, n in m["versions"].items())


def vacuum(table: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (and any orphan
    dirs from crashed writes); returns the removed version ids. Whole-
    directory removal — versions never share files, so there is no
    liveness bookkeeping."""
    m = _read_manifest(table)
    live = sorted(int(k) for k in m["versions"])
    doomed = live[:-keep_last] if keep_last > 0 else live
    kept = {str(v): m["versions"][str(v)] for v in live[-keep_last:]} if keep_last else {}
    vdir = os.path.join(table, "_versions")
    known = {f"v={v}" for v in live}
    removed = []
    for v in doomed:
        shutil.rmtree(os.path.join(vdir, f"v={v}"), ignore_errors=True)
        removed.append(v)
    if os.path.isdir(vdir):
        for d in os.listdir(vdir):  # orphans from crashed writes
            if d.startswith("v=") and d not in known:
                shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
    m["versions"] = kept
    _publish(table, m)
    return removed


def snapshot_diff(
    spark: SparkSession,
    table: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change data feed between two snapshot versions: every key
    classified as ``insert`` (new in v_to), ``delete`` (gone from
    v_from), or ``update`` (present in both, any non-key column
    changed) — the downstream-sync primitive a warehouse consumer
    polls instead of re-reading 100 TB.

    Plan: both versions collapse to ONE (key, multiset-fingerprint)
    row per key BEFORE any join — each row hashes its non-key struct
    via xxhash64 over the JSON encoding (to_json keys every field and
    drops null ones, so NULL patterns and delimiter-looking content
    cannot collide the way a concat_ws fold silently does), then a
    per-key aggregate folds (row count, sum of hashes): order- and
    multiset-safe, so ``key_cols`` need NOT uniquely identify rows —
    a key whose row multiset is unchanged never emits a spurious
    'update', and duplicate keys cannot cross-pair into n*m join rows.
    The partial aggregate combines map-side, so the diff joins ship 3
    narrow columns however wide or duplicated the table is.
    Inserts/deletes are anti-joins on the now-unique key, updates an
    inner join filtered on (count, hash-sum) inequality; all three
    shuffles share the key partitioning. The fingerprint never crosses
    engines (the gate's oracle re-derives changes relationally), so
    hash portability is a non-issue."""
    a = read_version(spark, table, v_from)
    b = read_version(spark, table, v_to)
    if set(a.columns) != set(b.columns):
        raise ValueError(
            "snapshot_diff requires identical schemas; "
            f"v{v_from} has {sorted(set(a.columns) - set(b.columns))} extra, "
            f"v{v_to} has {sorted(set(b.columns) - set(a.columns))} extra — "
            "project both versions to a common schema first"
        )
    val_cols = [c for c in a.columns if c not in key_cols]

    def keyed(df: DataFrame) -> DataFrame:
        # One row per key: (count, sum-of-row-hashes) is invariant
        # under row order and exactly identifies the row MULTISET up
        # to a ~2^-64 random hash collision (sum in decimal(38,0) so
        # the fold itself never wraps).
        h = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in val_cols])))
        return (
            df.select(*key_cols, h.alias("__h"))
            .groupBy(*key_cols)
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum(F.col("__h").cast("decimal(38,0)")).alias("__fp"),
            )
        )

    ka, kb = keyed(a), keyed(b)
    inserted = kb.join(ka.select(*key_cols), key_cols, "left_anti").select(
        F.lit("insert").alias("change"), *key_cols
    )
    deleted = ka.join(kb.select(*key_cols), key_cols, "left_anti").select(
        F.lit("delete").alias("change"), *key_cols
    )
    updated = (
        ka.select(
            *key_cols,
            F.col("__n").alias("__n_a"),
            F.col("__fp").alias("__fp_a"),
        )
        .join(kb, key_cols)
        .filter(
            (F.col("__n_a") != F.col("__n"))
            | (F.col("__fp_a") != F.col("__fp"))
        )
        .select(F.lit("update").alias("change"), *key_cols)
    )
    return inserted.unionByName(deleted).unionByName(updated)


def snapshot_changes(
    spark: SparkSession,
    table: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change feed WITH payload — the consumable twin of
    ``snapshot_diff``: insert/update rows carry their full ``v_to``
    values, delete rows carry NULL values (the key columns always
    populated). Duplicate keys follow the multiset contract: an
    insert/update key contributes ALL of its v_to rows, so applying
    the feed reproduces v_to's row multiset exactly.

    Plan: the classified keys from snapshot_diff (already narrow)
    join v_to's rows on the key — one key-partitioned shuffle shared
    with the diff's own joins; deletes project NULL payload from the
    classification alone, no extra scan."""
    diff = snapshot_diff(spark, table, v_from, v_to, key_cols)
    b = read_version(spark, table, v_to)
    val_cols = [c for c in b.columns if c not in key_cols]
    upserts = (
        diff.filter(F.col("change") != "delete")
        .join(b, key_cols)
        .select("change", *key_cols, *val_cols)
    )
    deletes = diff.filter(F.col("change") == "delete").select(
        "change",
        *key_cols,
        *[F.lit(None).cast(b.schema[c].dataType).alias(c) for c in val_cols],
    )
    return upserts.unionByName(deletes)


def apply_changes(
    base: DataFrame, changes: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Apply a ``snapshot_changes`` feed to ``base``: every key in the
    feed is removed from base (delete and update both retire the old
    rows; insert keys remove nothing by definition), then the
    insert/update payload rows append. By construction
    ``apply_changes(v_from, snapshot_changes(v_from→v_to))``
    reconstructs v_to's row multiset exactly — the downstream-replica
    sync primitive, property-tested in tests.

    Plan: one left-anti join on the (distinct, narrow) feed keys —
    scale-proportional to the feed, not the base, once AQE broadcasts
    a small feed — plus a union; no window, no full rewrite."""
    removed = base.join(
        changes.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    adds = changes.filter(F.col("change") != "delete").select(*base.columns)
    return removed.unionByName(adds)
