"""Fusion-vs-staged study for the composed curation pass (SCALE.md).

web_pipeline fuses C4 -> Gopher -> dedup into one plan (zero joins,
one narrow window exchange). The naive deployment materializes each
stage to parquet and re-scans — this script measures both on the same
derived corpus at x1/x10/x100 so the fusion claim carries a number.

Usage: python scripts/pipeline_fusion_study.py [--scales=1,10,100]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark  # noqa: E402
from building_coffee_commodity_trading_data_warehouse_spark.operators import curate  # noqa: E402
from building_coffee_commodity_trading_data_warehouse_spark.operators.textstats import (  # noqa: E402
    gopher_quality_rules,
)

SCALE_DIRS = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_scale/sf1",
    "100x": "/tmp/spark_graft_scale/sf10",
}


def derived_docs(spark, sf_dir):
    # the c_web_pipeline gate's corpus constructor, shared so the
    # study provably measures the corpus the gate verifies
    return entrymod._web_pipeline_derived(
        entrymod._t(spark, sf_dir, "documents")
    )


def fused(spark, sf_dir):
    out = curate.web_pipeline(derived_docs(spark, sf_dir), min_words=10)
    out.write.format("noop").mode("overwrite").save()


def staged(spark, sf_dir, workdir):
    from pyspark.sql import Window

    d = derived_docs(spark, sf_dir)
    p1 = os.path.join(workdir, "stage_c4")
    curate.c4_clean_rules(d, keep_text=True).write.mode("overwrite").parquet(p1)
    c4 = spark.read.parquet(p1)
    p2 = os.path.join(workdir, "stage_gopher")
    gopher_quality_rules(
        c4.select("doc_id", "clean_text", "clean_md5", "n_sentences", "pass_c4"),
        min_words=10, text_col="clean_text",
        carry=("clean_md5", "n_sentences", "pass_c4"),
    ).write.mode("overwrite").parquet(p2)
    g = spark.read.parquet(p2)
    survives = F.col("pass_c4") & F.col("pass_gopher")
    first = F.min(F.when(survives, F.col("doc_id"))).over(
        Window.partitionBy("clean_md5"))
    g.select("doc_id", "clean_md5", "n_words", "n_sentences",
             "pass_c4", "pass_gopher",
             (survives & (F.col("doc_id") == first)).alias("keep"),
             ).write.format("noop").mode("overwrite").save()


def main():
    scales = ["1x", "10x", "100x"]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [s.strip() + "x" for s in a.split("=", 1)[1].split(",")]
    spark = get_spark("fusion_study")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for sc in scales:
        sf_dir = SCALE_DIRS[sc]
        for mode in ("fused", "staged"):
            times = []
            for _ in range(2):  # warm-up + timed, best of 2
                t0 = time.monotonic()
                if mode == "fused":
                    fused(spark, sf_dir)
                else:
                    with tempfile.TemporaryDirectory(
                        prefix="fusion_staged_"
                    ) as wd:
                        staged(spark, sf_dir, wd)
                times.append(time.monotonic() - t0)
            res[f"{sc}_{mode}"] = round(min(times), 2)
        print("PARTIAL " + json.dumps(res), flush=True)
    print("RESULT " + json.dumps(res), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
