"""Batch-count axis for the persisted index lifecycles (SCALE.md r14,
VERDICT r13 item 3): a long-running survivor-appending stream commits
one tiny ``batch=`` partition per micro-batch, so search cost degrades
with COMMITTED BATCH COUNT even when total index size is constant.
This script holds the indexed data fixed and varies only how many
appends delivered it (1 / 8 / 32 / 64), times the search at each batch
count, then compacts and times again — the curve that picks a
``compact_every`` value for the streaming screens.

Covers the text near-dup index AND the IVF embedding index (the r13
verdict asked for the IVF extension of the history-axis study; the
phash index rides the identical shared machinery so the text curve
transfers).

Usage: python scripts/index_batchcount_axis.py [sf_dir]
Prints one JSON line per (index, n_batches) config.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from building_coffee_commodity_trading_data_warehouse_spark.operators import (  # noqa: E402
    dedup,
    similarity,
)
from building_coffee_commodity_trading_data_warehouse_spark.session import (  # noqa: E402
    get_spark,
)

N_BATCHES = [1, 8, 32, 64]
REPS = 3


def _median_wall(fn) -> float:
    samples = []
    for _ in range(REPS + 1):  # first rep is warm-up
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples[1:]), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("index_batchcount_axis")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0]
    d_cut, v_cut = max_doc // 2, max_vec // 2
    d_hist, d_batch = docs.filter(F.col("doc_id") <= d_cut), docs.filter(
        F.col("doc_id") > d_cut
    )
    v_hist, v_batch = emb.filter(F.col("vec_id") <= v_cut), emb.filter(
        F.col("vec_id") > v_cut
    )

    for n in N_BATCHES:
        # text near-dup index: history delivered as n appends
        p = f"/tmp/spark_graft_bc_nd_{os.getpid()}_{n}"
        dedup.neardup_index_build(
            d_hist.filter(F.col("doc_id") % n == 0), p, k=8, bands=4, n=2
        )
        for i in range(1, n):
            dedup.neardup_index_build(
                d_hist.filter(F.col("doc_id") % n == i),
                p,
                k=8,
                bands=4,
                n=2,
                mode="append",
                batch_tag=f"b{i}",
            )
        wall = _median_wall(
            lambda: dedup.neardup_index_search(spark, p, d_batch, threshold=0.2)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t0 = time.perf_counter()
        dedup.neardup_index_compact(spark, p)
        compact_wall = round(time.perf_counter() - t0, 3)
        wall_c = _median_wall(
            lambda: dedup.neardup_index_search(spark, p, d_batch, threshold=0.2)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        print(
            json.dumps(
                {
                    "index": "neardup",
                    "n_batches": n,
                    "search_wall": wall,
                    "search_wall_after_compact": wall_c,
                    "compact_wall": compact_wall,
                }
            ),
            flush=True,
        )
        shutil.rmtree(p, ignore_errors=True)

        # IVF embedding index: same axis
        p = f"/tmp/spark_graft_bc_ivf_{os.getpid()}_{n}"
        similarity.ivf_index_build(
            v_hist.filter(F.col("vec_id") % n == 0), p, n_centroids=16
        )
        for i in range(1, n):
            similarity.ivf_index_append(
                v_hist.filter(F.col("vec_id") % n == i), p, batch_tag=f"b{i}"
            )
        qs = v_batch.select("vec_id", "embedding")
        wall = _median_wall(
            lambda: similarity.ivf_index_search(
                spark, p, qs, k=5, nprobe=8, bounded=True
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t0 = time.perf_counter()
        similarity.ivf_index_compact(spark, p)
        compact_wall = round(time.perf_counter() - t0, 3)
        wall_c = _median_wall(
            lambda: similarity.ivf_index_search(
                spark, p, qs, k=5, nprobe=8, bounded=True
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        print(
            json.dumps(
                {
                    "index": "ivf",
                    "n_batches": n,
                    "search_wall": wall,
                    "search_wall_after_compact": wall_c,
                    "compact_wall": compact_wall,
                }
            ),
            flush=True,
        )
        shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    main()
