"""Isolated warm-rep protocol (SCALE.md round-8(3) / BASELINE.md).

Per-query bench ratios from a single full-bench run carry no signal at
the 0.3–3 s magnitudes of sf0.1 — a co-tenant CPU burst lands on
whichever query is running. The stable per-query judgment is this
protocol: ONE fresh JVM per query, one warm-up run, then a
ramp-until-stable phase (reps until two successive agree within 5%,
cap 8 — JIT/BLAS-heavy paths warm slower than one rep; r10 verdict
item 4), then N timed reps back-to-back, with the constant-work CPU
probe taken around them so the reading can be calibrated against the
frozen baseline's probe.

Usage:
    python scripts/isolated_reps.py q1 [q2 ...]      # default 5 reps
    SPARK_GRAFT_ISO_REPS=7 python scripts/isolated_reps.py q1

Prints one JSON line per query:
    {"query": ..., "reps": [...], "median": ..., "min": ...,
     "cal_cpu": ..., "frozen": ..., "ratio_median": ...,
     "ratio_calibrated": ...}

Each query runs in a SUBPROCESS so every reading starts from a cold
JVM but reports only warm reps — the protocol the r8 verdict asks
round 9 to clear the six >2x outliers with.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from bench import EXTRA, _calibration_cpu_sec
import __spark_entry__ as entry_mod
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark

name = {name!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or min(os.cpu_count() or 8, 32)
spark = get_spark("coffee_dw_iso", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
fn = EXTRA.get(name) or entry_mod.queries()[name]

# the IVF SEARCH entries read the index that s_ivf_index_build wrote
# under a PID-keyed path — a fresh subprocess has no index yet, so
# build it first (untimed; mirrors the bench's phase ordering)
if name == "d_nd_index_search":
    EXTRA["d_nd_index_build"](spark, sf_dir)
if name in ("s_ivf_index_search", "s_ivf_search_dist"):
    EXTRA["s_ivf_index_build"](spark, sf_dir)

def run_once():
    t0 = time.perf_counter()
    res = fn(spark, sf_dir)
    if res is not None:
        res.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    # Release the previous rep's JVM-side state BETWEEN reps (r13):
    # gates built around eager localCheckpoint (c_full_curation) pin
    # checkpointed RDD blocks until the Python DataFrame ref is
    # GC'd AND the ContextCleaner runs — without the explicit
    # collect, reps 3-5 in one JVM read 8 s -> 17 s of pure storage/
    # GC pressure growth, which is a harness artifact, not the
    # query's steady-state cost.
    import gc
    del res
    gc.collect()
    return dt

cal0 = _calibration_cpu_sec()
run_once()  # warm-up: JVM JIT, scan caches, broadcast build
# Ramp-until-stable (r10 verdict item 4): JIT/BLAS-heavy paths (the
# k-means+GEMM SemDeDup family) keep speeding up for several reps
# after the single warm-up — freezing or reading from the ramp makes
# the entry cry wolf every later round. Keep taking ramp reps until
# two successive reps agree within 5% (cap 8), then take the timed
# reps from the stable tail.
ramp = [run_once()]
while len(ramp) < 8:
    t = run_once()
    prev = ramp[-1]
    ramp.append(t)
    if abs(t - prev) <= 0.05 * max(t, prev):
        break
reps = [run_once() for _ in range({reps})]
cal1 = _calibration_cpu_sec()
print("ISO_RESULT " + json.dumps(
    {{"query": name, "reps": [round(r, 3) for r in reps],
      "ramp": [round(r, 3) for r in ramp],
      "cal_cpu": round(min(cal0, cal1), 3)}}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    queries = sys.argv[1:]
    if not queries:
        print("usage: isolated_reps.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    n_reps = int(os.environ.get("SPARK_GRAFT_ISO_REPS", "5") or 5)
    base = {}
    base_path = os.path.join(repo, "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh)
    for name in queries:
        script = _CHILD.format(repo=repo, name=name, reps=n_reps)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", script],
                capture_output=True,
                text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({"query": name, "error": "timeout"}))
            continue
        line = next(
            (
                ln[len("ISO_RESULT ") :]
                for ln in proc.stdout.splitlines()
                if ln.startswith("ISO_RESULT ")
            ),
            None,
        )
        if line is None:
            print(
                json.dumps(
                    {
                        "query": name,
                        "error": "no result",
                        "rc": proc.returncode,
                        "tail": proc.stdout[-300:] + proc.stderr[-300:],
                    }
                )
            )
            continue
        out = json.loads(line)
        out["median"] = round(statistics.median(out["reps"]), 3)
        out["min"] = round(min(out["reps"]), 3)
        frozen = (base.get("queries") or {}).get(name)
        if frozen:
            out["frozen"] = frozen
            out["ratio_median"] = round(out["median"] / frozen, 2)
            if base.get("calibration_cpu_sec") and out.get("cal_cpu"):
                drift = out["cal_cpu"] / base["calibration_cpu_sec"]
                out["cal_drift"] = round(drift, 3)
                out["ratio_calibrated"] = round(
                    out["median"] / frozen / drift, 2
                )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
