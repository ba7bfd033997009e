"""Decade-curve sweep: run named gate queries from __spark_entry__
at sf0.1 / x10 / x100 replicas (noop sink) and print one JSON line per
query — the empirical backing for SCALE.md (verdict r6 item 8).

Usage: python scripts/decade_sweep.py q1 [q2 ...] [--scales 1,10,100]
Replicas must exist (scripts/make_scaled_data.py 10|100 <dir>).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_DIRS = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_scale/sf1",
    "100x": "/tmp/spark_graft_scale/sf10",
}


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    scales = ["1x", "10x", "100x"]
    for a in sys.argv[1:]:
        if a.startswith("--scales="):
            scales = [s.strip() + "x" for s in a.split("=", 1)[1].split(",")]

    import __spark_entry__ as entrymod
    from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark

    spark = get_spark("decade_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        res = {}
        for scale in scales:
            sf_dir = SCALE_DIRS[scale]
            # warm-up then best-of-2, like the SCALE.md protocol
            times = []
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            res[scale] = round(min(times), 2)
        print(json.dumps({name: res}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
