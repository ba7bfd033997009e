"""Decade-curve sweep: run named gate queries from __spark_entry__
at sf0.1 / x10 / x100 replicas (noop sink) and print one JSON line per
query — the empirical backing for SCALE.md (verdict r6 item 8).

Each query runs in its OWN subprocess (fresh 8g JVM): back-to-back
runs of heavyweight queries in one session accumulate broadcast blocks
faster than the ContextCleaner collects them and OOM the shared heap —
observed twice before this isolation. A query that still dies reports
{"error": ...} instead of killing the batch.

Usage: python scripts/decade_sweep.py q1 [q2 ...] [--scales=1,10,100]
Replicas must exist (scripts/make_scaled_data.py 10|100 <dir>).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALE_DIRS = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_scale/sf1",
    "100x": "/tmp/spark_graft_scale/sf10",
}

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import __spark_entry__ as entrymod
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark

spark = get_spark("decade_sweep")
spark.sparkContext.setLogLevel("ERROR")
fn = entrymod.queries()[%(name)r]
res = {}
for scale, sf_dir in %(scales)r:
    times = []
    for _ in range(2):  # warm-up + timed (best of 2)
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    res[scale] = round(min(times), 2)
print("RESULT " + json.dumps(res), flush=True)
spark.stop()
"""


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    scales = ["1x", "10x", "100x"]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [s.strip() + "x" for s in a.split("=", 1)[1].split(",")]
    pairs = [(s, SCALE_DIRS[s]) for s in scales]

    for name in names:
        script = _CHILD % {"repo": REPO, "name": name, "scales": pairs}
        try:
            proc = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True,
                text=True,
                timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # a hung query must report, not kill the whole sweep
            print(json.dumps({name: {"error": "timeout after 3600s"}}), flush=True)
            continue
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
        if row is None:
            # progress bars (\r frames) drown the traceback — keep only
            # diagnostic lines when picking the error tail
            raw = (proc.stderr or "") + "\n" + (proc.stdout or "")
            diag = [
                ln.strip()
                for chunk in raw.splitlines()
                for ln in chunk.split("\r")
                if ln.strip()
                and not ln.lstrip().startswith("[Stage")
                and ("Error" in ln or "error" in ln or "Exception" in ln)
            ]
            tail = diag[-3:] if diag else ["no diagnostic output"]
            row = {"error": " | ".join(tail)[:500]}
        print(json.dumps({name: row}), flush=True)


if __name__ == "__main__":
    main()
