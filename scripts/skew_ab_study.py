"""Hot-key A/B: window election vs the r11 salted aggregate+join
(SCALE.md round-11) on a corpus where the skew actually bites.

Synthesizes n_docs documents of which 60% share one boilerplate line
(the cookie-banner profile line_dedup exists to kill), then times
three election shapes over the exploded lines:

  window  — the r10 shape: Window.partitionBy(line), every hot-line
            row through ONE reducer;
  plain   — r11 interim 1: two-level aggregate + unsalted join
            (AQE skew split never fires here — aggregate-fed join);
  salted  — r11 interim 2 (REJECTED by this study): aggregate +
            salted join — spreads the hot key but replicates the
            firsts side 16x, and firsts is corpus-sized when most
            lines are unique;
  hybrid  — r11 final: heavy keys (count >= 1000) resolve through
            a broadcast dictionary and enter the one shuffle join
            under their own row identity (skew redirect, marker
            column against false matches); light keys join normally
            with a threshold-bounded reducer. ONE probe evaluation.
            This is the shape keeper_election and line_dedup ship.

Run AFTER the full suite (timing study). One fresh JVM per shape.
Usage: python scripts/skew_ab_study.py [n_docs]   (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F, Window
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark
from building_coffee_commodity_trading_data_warehouse_spark.operators.joins import salted_join

spark = get_spark("skew_ab")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.range(%(n)d).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") %% 5 < 3,
           F.concat(F.lit("unique line number "), F.col("id").cast("string"),
                    F.lit("\nACCEPT ALL COOKIES TO CONTINUE BROWSING THIS SITE NOW PLEASE AND THANK YOU")))
     .otherwise(F.concat(F.lit("only unique content here "), F.col("id").cast("string")))
     .alias("text"),
)
lines = docs.select(
    "doc_id", F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line")
).filter(F.length("line") >= 2)

shape = %(shape)r
def build():
    if shape == "window":
        w = Window.partitionBy("line")
        first = F.min(F.struct("doc_id", "idx")).over(w)
        return lines.withColumn("__f", first).select(
            F.sum(((F.col("doc_id") == F.col("__f.doc_id"))
                   & (F.col("idx") == F.col("__f.idx"))).cast("long")).alias("kept"))
    if shape == "hybrid":
        firsts = lines.groupBy("line").agg(
            F.min(F.struct("doc_id", "idx")).alias("__f"),
            F.count(F.lit(1)).cast("long").alias("__n"))
        heavy = firsts.filter(F.col("__n") >= 1000).select(
            "line", F.col("__f").alias("__fh"), F.lit(True).alias("__hv"))
        light = firsts.filter(F.col("__n") < 1000).select(
            F.col("line").alias("__jk"), F.lit(0).alias("__hm"), "__f")
        hv = F.coalesce(F.col("__hv"), F.lit(False))
        probe = lines.join(F.broadcast(heavy), "line", "left").select(
            "doc_id", "idx", "line", "__fh",
            F.when(hv, F.concat_ws("_", F.col("doc_id"), F.col("idx")))
             .otherwise(F.col("line")).alias("__jk"),
            F.when(hv, F.lit(1)).otherwise(F.lit(0)).alias("__hm"))
        joined = probe.join(light, ["__jk", "__hm"], "left").select(
            "doc_id", "idx", "line",
            F.coalesce(F.col("__f"), F.col("__fh")).alias("__f"))
    else:
        firsts = lines.groupBy("line").agg(F.min(F.struct("doc_id", "idx")).alias("__f"))
        if shape == "plain":
            joined = lines.join(firsts, "line")
        else:
            joined = salted_join(lines, firsts, "line", salt_cols=["doc_id", "idx"])
    return joined.select(
        F.sum(((F.col("doc_id") == F.col("__f.doc_id"))
               & (F.col("idx") == F.col("__f.idx"))).cast("long")).alias("kept"))

build().collect()  # warm-up
reps = []
for _ in range(3):
    t0 = time.perf_counter()
    kept = build().collect()[0][0]
    reps.append(round(time.perf_counter() - t0, 2))
print("AB_RESULT " + json.dumps({"shape": shape, "reps": reps, "kept": kept}))
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    for shape in ("window", "plain", "salted", "hybrid"):
        proc = subprocess.run(
            [sys.executable, "-c",
             _CHILD % {"repo": REPO, "n": n, "shape": shape}],
            capture_output=True, text=True, timeout=900,
        )
        line = next(
            (ln[len("AB_RESULT "):] for ln in proc.stdout.splitlines()
             if ln.startswith("AB_RESULT ")),
            None,
        )
        print(line or json.dumps(
            {"shape": shape, "error": proc.stdout[-200:] + proc.stderr[-200:]}
        ), flush=True)


if __name__ == "__main__":
    main()
