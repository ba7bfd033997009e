"""Fused-vs-staged study for the r12 full_curation capstone (r11
verdict item 6): the shipped shape is ONE composed plan with
localCheckpoint lineage cuts at the two text-carrying stage
boundaries; the alternative a production pipeline would naturally
reach for is STAGING every boundary to parquet and reading it back
(five independent jobs). This measures both on the same derived
corpus so SCALE.md can record which composition wins and by how much.

Usage: python scripts/full_curation_staged_study.py [sf_dir ...]
Defaults to sf0.1 and the x10 replica when present.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark


def _derived(spark, sf_dir):
    # the gate's OWN corpus constructor — the study provably measures
    # the corpus c_full_curation verifies
    from building_coffee_commodity_trading_data_warehouse_spark import catalog

    return entry_mod._full_curation_derived(
        catalog.table(spark, sf_dir, "documents")
    )


def fused(spark, sf_dir, hist_max):
    from building_coffee_commodity_trading_data_warehouse_spark.operators import curate

    return curate.full_curation(
        _derived(spark, sf_dir), history_max_id=hist_max,
        min_words=10, para_sep="\n", neardup_threshold=0.2,
    )


def staged(spark, sf_dir, hist_max, tmp):
    """Same six stages, every boundary staged to parquet and read
    back — the conventional multi-job pipeline layout."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        curate, dedup, urls,
    )

    def stage(df, name):
        p = f"{tmp}/{name}"
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    d = stage(_derived(spark, sf_dir), "derived")
    block = urls.domain_rollup(d, min_docs=5, max_dup_rate=0.5).filter(
        F.col("is_suspect")
    )
    f = stage(urls.domain_filter(d, block).select("doc_id", "text"),
              "filtered")
    wp = curate.web_pipeline(f, min_words=10)
    kept = stage(
        f.join(wp.filter(F.col("keep")).select("doc_id"), "doc_id",
               "left_semi"),
        "kept",
    )
    clean = stage(
        curate.c4_clean_rules(kept, keep_text=True).select(
            "doc_id", F.col("clean_text").alias("text")),
        "clean",
    )
    para = stage(
        dedup.line_dedup(clean, min_line_chars=2, sep="\n",
                         keep_text=True)
        .select("doc_id", F.col("text_clean").alias("text")),
        "para",
    )
    hist = para.filter(F.col("doc_id") < hist_max)
    batch = para.filter(F.col("doc_id") >= hist_max)
    nd = dedup.incremental_neardup(hist, batch, k=8, bands=4, n=2,
                                   threshold=0.2)
    surv = stage(
        hist.unionByName(
            batch.join(nd.filter(~F.col("is_neardup")).select("doc_id"),
                       "doc_id", "left_semi")),
        "surv",
    )
    chunks = curate.chunk_documents(surv, chunk=64, stride=48)
    return curate.pack_chunks(
        chunks.withColumn("shard", (F.col("doc_id") % 8).cast("long")),
        max_tokens=256,
    ).select("doc_id", "chunk_id", "shard", "n_tokens", "chunk_text",
             "pack_offset", "pack_id")


def main():
    sf_dirs = sys.argv[1:] or [
        d for d in ("/root/testdata/sf0.1", "/tmp/spark_graft_scale/sf1")
        if os.path.isdir(d)
    ]
    spark = get_spark("full_curation_study")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        from building_coffee_commodity_trading_data_warehouse_spark import catalog

        hist_max = (
            catalog.table(spark, sf_dir, "documents")
            .selectExpr("max(doc_id) div 2 AS m").head()["m"]
        )
        out = {"sf_dir": sf_dir, "hist_max": int(hist_max)}
        for label, fn in (("fused", fused), ("staged", staged)):
            times = []
            for _ in range(2):  # warm-up + timed, best of 2
                tmp = tempfile.mkdtemp(prefix="sg_fcs_")
                t0 = time.monotonic()
                df = (fn(spark, sf_dir, hist_max) if label == "fused"
                      else fn(spark, sf_dir, hist_max, tmp))
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.monotonic() - t0, 2))
            out[label] = min(times)
            out[f"{label}_reps"] = times
        # row-identity cross-check (cheap at sf scale)
        a = fused(spark, sf_dir, hist_max)
        tmp = tempfile.mkdtemp(prefix="sg_fcs_")
        b = staged(spark, sf_dir, hist_max, tmp)
        out["rows_equal"] = (
            a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        )
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
