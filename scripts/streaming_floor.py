"""availableNow harness floor measurement (r15, VERDICT r14 item 4).

st_tumbling_counts has read ≥2x its frozen value in two consecutive
driver rounds while its code never changed; every exoneration pleaded
"the availableNow harness floor". This script MEASURES that floor so
the analysis can subtract it instead of pleading it: the SAME
tumbling aggregate (windows.tumbling_counts) drained through the SAME
run_available_now memory-sink harness over a ONE-ROW landing
directory — everything the entry pays except the data: streaming
query planning, checkpoint + offset/commit log setup, state-store
init for spark.sql.shuffle.partitions state partitions, sink setup,
query start/stop.

Usage: python scripts/streaming_floor.py [reps]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench contract)

Prints per-rep floor and full-entry walls plus the medians and the
data-dependent remainder (full − floor).
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_coffee_commodity_trading_data_warehouse_spark import catalog  # noqa: E402
from building_coffee_commodity_trading_data_warehouse_spark.session import (  # noqa: E402
    get_spark,
)
from building_coffee_commodity_trading_data_warehouse_spark.streaming import (  # noqa: E402
    pipeline,
    windows as swin,
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or 32
    spark = get_spark("streaming_floor", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    ev = catalog.table(spark, sf_dir, "events")
    one = tempfile.mkdtemp(prefix="spark_graft_floor_")
    ev.limit(1).coalesce(1).write.mode("overwrite").parquet(one)

    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()["st_tumbling_counts"]

    floors, fulls = [], []
    seq = 0
    for rep in range(reps):
        t0 = time.perf_counter()
        agg = swin.tumbling_counts(pipeline.stream_events(spark, one))
        seq += 1
        out = pipeline.run_available_now(agg, f"floor_{os.getpid()}_{seq}")
        out.write.format("noop").mode("overwrite").save()
        floors.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        res = fn(spark, sf_dir)
        res.write.format("noop").mode("overwrite").save()
        fulls.append(round(time.perf_counter() - t0, 3))
        print(f"rep{rep}: floor={floors[-1]} full={fulls[-1]}", flush=True)
    fm, um = statistics.median(floors), statistics.median(fulls)
    print(
        f"median floor={fm} full={um} data_remainder={round(um - fm, 3)} "
        f"floor_share={round(fm / um, 2)}"
    )


if __name__ == "__main__":
    main()
