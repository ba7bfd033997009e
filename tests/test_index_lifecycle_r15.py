"""Round-15 optimization-round tests for the index write path.

Covers the machinery this round changed (OPTIMIZATION_r15.md):

* driver-side sidecar WRITES for local paths (meta + manifest commit
  rows, previously one Spark job each) — schema and layout must stay
  byte-compatible with the Spark route both readers use;
* the RENAME-published manifest swap (r14 ADVICE item 1: the old
  delete-dir-then-write overwrite left a job-long torn window in the
  streaming auto-compact path) — leftover staging dirs from a crash
  are swept, the published manifest holds exactly the surviving tags;
* scheme parsing in ``_is_local_index_path`` (r14 ADVICE item 4:
  ``hdfs:/x`` must not be classified local);
* the leaf-safe ``scan_partitions`` probe behind every widen guard
  (r14 ADVICE item 5: composed inputs skip the widen instead of
  executing their upstream DAG via ``df.rdd`` under AQE);
* the AQE rebalance before index-table writes (guide §6) — one
  advisory-sized file per small batch table instead of one sliver
  per upstream task, search results unchanged.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators import dedup
from building_coffee_commodity_trading_data_warehouse_spark.session import (
    scan_partitions,
)


def _docs(spark, n=40, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta token"),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )


def test_is_local_index_path_scheme_parsing():
    assert dedup._is_local_index_path("/tmp/idx")
    assert dedup._is_local_index_path("relative/idx")
    assert dedup._is_local_index_path("file:/tmp/idx")
    assert dedup._is_local_index_path("file:///tmp/idx")
    # r14 ADVICE item 4: single-slash scheme URIs are NOT local
    assert not dedup._is_local_index_path("hdfs:/x")
    assert not dedup._is_local_index_path("hdfs://nn/x")
    assert not dedup._is_local_index_path("s3a://bucket/x")


def test_driver_side_sidecars_match_spark_layout(spark, tmp_path):
    """The pyarrow-written meta / manifest rows must read identically
    through BOTH readers (pyarrow fast path and the Spark fallback),
    with the int32 meta schema the Spark route wrote."""
    p = str(tmp_path / "nd")
    dedup.neardup_index_build(_docs(spark), p, k=4, bands=2, n=2)
    # meta: int32 columns, one row, both readers agree
    row = dedup._meta_row(spark, p)
    assert {"k": row["k"], "bands": row["bands"], "n": row["n"]} == {
        "k": 4,
        "bands": 2,
        "n": 2,
    }
    srow = spark.read.parquet(f"{p}/meta").collect()[0]
    assert (srow["k"], srow["bands"], srow["n"]) == (4, 2, 2)
    mfile = glob.glob(os.path.join(p, "meta", "*.parquet"))[0]
    assert str(pq.read_schema(mfile).field("k").type) == "int32"
    # manifest commit row: committed=true, bool, readable via Spark
    dedup.neardup_index_build(
        _docs(spark, start=40), p, k=4, bands=2, n=2,
        mode="append", batch_tag="b2",
    )
    mrows = spark.read.parquet(f"{p}/manifest").collect()
    assert all(r["committed"] is True for r in mrows)
    assert "b2" in {str(r["batch"]) for r in mrows}
    assert dedup._committed_view(spark, p) is not None
    assert len(dedup._committed_view(spark, p)) == 2


def test_manifest_swap_rename_publish_and_sweep(spark, tmp_path):
    """Compaction publishes the manifest by rename: exactly the
    surviving tags are referenced, no staging/aside dirs remain, and
    stale ``.manifest-*`` leftovers from a prior crash are swept."""
    p = str(tmp_path / "nd")
    dedup.neardup_index_build(_docs(spark), p, k=4, bands=2, n=2)
    dedup.neardup_index_build(
        _docs(spark, start=40), p, k=4, bands=2, n=2,
        mode="append", batch_tag="b2",
    )
    # plant a stale crash leftover: the next successful swap sweeps it
    stale = os.path.join(p, ".manifest-swap-deadbeef")
    os.makedirs(os.path.join(stale, "batch=zombie"), exist_ok=True)
    bid = dedup.neardup_index_compact(spark, p)
    assert bid is not None and bid.startswith("compact-")
    committed = dedup._committed_view(spark, p)
    assert committed == [bid]
    assert not glob.glob(os.path.join(p, ".manifest-*"))
    # excluded tags survive the swap alongside the compact batch
    dedup.neardup_index_build(
        _docs(spark, start=80), p, k=4, bands=2, n=2,
        mode="append", batch_tag="b3",
    )
    bid2 = dedup.neardup_index_compact(spark, p, exclude_tags=["b3"])
    assert sorted(dedup._committed_view(spark, p)) == sorted([bid2, "b3"])


def test_rebalanced_batch_writes_search_identical(spark, tmp_path):
    """Guide §6: the rebalance-before-write must not change WHAT the
    index holds — a search over the rebalanced index returns the same
    verdict rows as the in-flight (index-less) computation."""
    hist = _docs(spark, n=60)
    batch = _docs(spark, n=20, start=60)
    p = str(tmp_path / "nd")
    dedup.neardup_index_build(hist, p, k=4, bands=2, n=2)
    via_index = dedup.neardup_index_search(spark, p, batch, threshold=0.2)
    inflight = dedup.incremental_neardup(
        hist, batch, k=4, bands=2, n=2, threshold=0.2
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(via_index) == key(inflight)
    # and the small batch tables landed as a handful of files, not
    # one sliver per upstream task
    for t in ("bands", "sizes"):
        files = glob.glob(os.path.join(p, t, "batch=*", "*.parquet"))
        assert 0 < len(files) <= 4, (t, len(files))


def test_scan_partitions_leaf_vs_composed(spark):
    docs = _docs(spark)
    # leaf shapes: exact partition counts
    assert scan_partitions(docs) >= 1
    assert scan_partitions(docs.filter(F.col("doc_id") < 5)) >= 1
    assert scan_partitions(docs.select("doc_id")) >= 1
    # composed shapes: None — the widen guards must skip these
    assert scan_partitions(docs.groupBy("text").count()) is None
    assert (
        scan_partitions(docs.join(docs.select("doc_id"), "doc_id")) is None
    )


def test_remote_scheme_paths_take_spark_route(spark, tmp_path):
    """A single-slash scheme URI must NOT be glob-probed as local:
    the preflight should surface the (remote) filesystem's error, not
    a spurious local 'torn build' verdict."""
    with pytest.raises(Exception) as ei:
        dedup._meta_row(spark, "hdfs:/definitely/missing/idx")
    # AnalysisException (no such path / unknown fs) — NOT a KeyError
    # from an empty local glob result
    assert "hdfs" in str(ei.value).lower() or "path" in str(ei.value).lower()


def test_run_id_mint_local_exclusive_and_torn_recovery(spark, tmp_path):
    """r14 ADVICE item 2: the local mint is link-atomic — a fully
    written marker or none; an EMPTY marker younger than the grace
    window is re-read (a racer may be mid-write on a pre-r15 layout),
    an old one is cleared and re-minted."""
    import os
    import time

    from building_coffee_commodity_trading_data_warehouse_spark.streaming.pipeline import (
        _checkpoint_run_id,
    )

    ckpt = str(tmp_path / "ckpt")
    a = _checkpoint_run_id(spark, ckpt)
    assert a and _checkpoint_run_id(spark, ckpt) == a
    # no temp leftovers from the link publish
    assert [f for f in os.listdir(ckpt) if f.startswith("run_id.")] == []
    # old empty marker (pre-hardening crash): cleared and re-minted
    marker = os.path.join(ckpt, "run_id")
    os.unlink(marker)
    open(marker, "w").close()
    old = time.time() - 60
    os.utime(marker, (old, old))
    b = _checkpoint_run_id(spark, ckpt)
    assert b and b != ""
    assert open(marker).read().strip() == b
