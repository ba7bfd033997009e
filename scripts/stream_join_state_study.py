"""Stream-stream interval-join state study (SCALE.md round-9).

The st_stream_join gate drains a static dir in ONE availableNow batch
— exact for verification, but the join buffers every row in state
(no watermark progress inside a batch), which is NOT the production
shape. Production landing dirs receive files in event-time order and
are consumed with bounded triggers, so the watermark advances BETWEEN
batches and the join state stays O(join window), not O(corpus).

This script measures both modes on the SAME time-ordered staging of
the x10/x100 events replica:
  A) one-batch drain (the gates' verification mode)
  B) maxFilesPerTrigger=2 bounded triggers (production mode)
and reports wall, output rows (must be EQUAL: ordered arrival means
nothing is ever behind the watermark), and peak state rows.

Usage: python scripts/stream_join_state_study.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark import catalog
from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark
from building_coffee_commodity_trading_data_warehouse_spark.streaming import pipeline


def stage_ordered(spark, sf_dir: str, n_files: int) -> str:
    """Write the events table into a landing dir as ``n_files``
    event-time-range files with ascending mtimes, i.e. the layout a
    real ingestion pipeline lands: file k holds strictly earlier
    events than file k+1 and arrived earlier."""
    land = tempfile.mkdtemp(prefix="spark_graft_ordered_land_")
    ev = catalog.table(spark, sf_dir, "events")
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(land)
    )
    parts = sorted(
        f for f in os.listdir(land) if f.endswith(".parquet")
    )
    t0 = time.time() - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(land, f), (t0 + i * 10, t0 + i * 10))
    return land


def run_join(spark, land: str, name: str, max_files: int | None):
    schema = spark.read.parquet(land).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    ev = reader.load(land)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("view_ts") <= F.col("click_ts"))
    )
    joined = pipeline.interval_join(clicks, views, cond, ("click_ts", "view_ts"))
    t0 = time.monotonic()
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    peak_state = 0
    n_batches = 0
    for p in q.recentProgress:
        n_batches += 1
        ops = p.get("stateOperators") or []
        peak_state = max(
            peak_state, sum(op.get("numRowsTotal", 0) for op in ops)
        )
    rows = spark.table(name).count()
    return {
        "wall_sec": round(wall, 2),
        "rows": rows,
        "peak_state_rows": peak_state,
        "batches": n_batches,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf10"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("stream_join_state_study")
    spark.sparkContext.setLogLevel("ERROR")
    land = stage_ordered(spark, sf_dir, n_files)
    res = {
        "one_batch_drain": run_join(spark, land, "sj_drain", None),
        "bounded_triggers": run_join(spark, land, "sj_bounded", 2),
    }
    res["rows_equal"] = (
        res["one_batch_drain"]["rows"] == res["bounded_triggers"]["rows"]
    )
    print("RESULT " + json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
