"""History-growth axis for incremental_neardup (SCALE.md round-11):
the decade sweep of the d_incremental_neardup GATE grows the BATCH
(history is the fixed first 250 ids), which measures per-batch cost.
The production question is the other axis — a FIXED batch landing
against ever-larger history. This script pins batch = the last 500
doc_ids of each replica scale and history = everything before them
(4.5k -> 49.5k -> 499.5k docs), one fresh JVM per scale.

Usage: python scripts/incremental_neardup_history_axis.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/spark_graft_scale/sf1"),
    ("100x", "/tmp/spark_graft_scale/sf10"),
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark
from building_coffee_commodity_trading_data_warehouse_spark.operators import dedup

spark = get_spark("neardup_axis")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(%(sf)r + "/documents.parquet")
cut = docs.agg(F.max("doc_id")).collect()[0][0] - 499
hist = docs.filter(F.col("doc_id") < cut)
batch = docs.filter(F.col("doc_id") >= cut)
t0 = time.perf_counter()
out = dedup.incremental_neardup(hist, batch, k=8, bands=4, n=2, threshold=0.2)
out.write.format("noop").mode("overwrite").save()
wall = time.perf_counter() - t0
n_dup = out.filter("is_neardup").count()

# indexed path: history materialized ONCE (untimed build), per-batch
# cost = search only — the production cycle the operator prescribes
import os, shutil
ipath = "/tmp/spark_graft_neardup_axis_%%d" %% os.getpid()
dedup.neardup_index_build(hist, ipath, k=8, bands=4, n=2)
t1 = time.perf_counter()
out2 = dedup.neardup_index_search(spark, ipath, batch, threshold=0.2)
out2.write.format("noop").mode("overwrite").save()
wall_idx = time.perf_counter() - t1
shutil.rmtree(ipath, ignore_errors=True)
print("AXIS_RESULT " + json.dumps(
    {"wall": round(wall, 2), "wall_indexed_search": round(wall_idx, 2),
     "n_hist": hist.count(), "n_dup": n_dup}))
"""


def main() -> None:
    res = {}
    for label, sf in SCALES:
        if not os.path.isdir(sf):
            res[label] = {"error": "missing replica dir"}
            continue
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": REPO, "sf": sf}],
            capture_output=True, text=True, timeout=900,
        )
        line = next(
            (
                ln[len("AXIS_RESULT "):]
                for ln in proc.stdout.splitlines()
                if ln.startswith("AXIS_RESULT ")
            ),
            None,
        )
        res[label] = (
            json.loads(line)
            if line
            else {"error": proc.stdout[-200:] + proc.stderr[-200:]}
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
