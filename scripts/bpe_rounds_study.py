"""Measure train_bpe driver-round efficiency on the real documents
corpus (verdict r8 item 6): how many driver rounds a vocabulary of
``n_merges`` costs under the current _safe_merge_batch policy, and the
per-round batch sizes (a collapsed batch = a self-pair-heavy head,
e.g. English 'll'/'ee'/'oo'/'ss' doubles).

Usage: python scripts/bpe_rounds_study.py [n_merges] [batch_cap] [src]
[--driver]. ``src`` is an sf parquet dir OR a plain-text corpus file
(one big lowercase blob). --driver routes through the driver-vocab
fast path instead of forcing the iterative batched path. Prints one
JSON line {path, rounds, merges, ..., sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_coffee_commodity_trading_data_warehouse_spark.operators import textstats
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_merges = int(args[0]) if len(args) > 0 else 256
    batch_cap = int(args[1]) if len(args) > 1 else 32
    src = args[2] if len(args) > 2 else "/root/testdata/sf0.01"
    driver_max = 10_000_000 if "--driver" in sys.argv else 0
    spark = get_spark("bpe_rounds_study")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(src):
        docs = spark.read.parquet(f"{src}/documents.parquet")
    else:
        text = open(src, encoding="utf8").read()
        chunks = [
            (i, text[i * 20000 : (i + 1) * 20000])
            for i in range((len(text) + 19999) // 20000)
        ]
        docs = spark.createDataFrame(chunks, "doc_id long, text string")
    stats: dict = {}
    t0 = time.monotonic()
    merges = textstats.train_bpe(
        docs,
        n_merges=n_merges,
        batch_cap=batch_cap,
        stats=stats,
        driver_vocab_max=driver_max,
    )
    sec = time.monotonic() - t0
    print(
        "RESULT "
        + json.dumps(
            {
                "path": stats.get("path"),
                "rounds": stats["rounds"],
                "merges": len(merges),
                "n_merges": n_merges,
                "batch_cap": batch_cap,
                "mean_batch": round(len(merges) / max(stats["rounds"], 1), 2),
                "self_pair_merges": sum(1 for l, r in merges if l == r),
                "sec": round(sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
