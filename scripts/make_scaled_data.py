"""Build a ~sf1-equivalent dataset by replicating sf0.1 tenfold with
key offsets, for EMPIRICAL SCALING MEASUREMENT ONLY (SCALE.md).

Correctness gates always run against the driver-provided
/root/testdata/sf* parquet; this derived set exists solely to measure
how the headline plans scale one decade up (verdict r3 item 6).

Replication preserves join cardinality growth: scaling keys
(custkey/suppkey/partkey/orderkey/event ids/doc ids/vec ids) are
offset per replica so a 10x row count produces 10x join output — a
naive row copy would square the per-key fan-out instead. Fixed dims
(region, nation) stay at their TPC-H-fixed cardinality, exactly like
real TPC-H scale factors. Dates/users are left as-is so per-key
history depth grows, which is the adversarial case for the window
and sessionize plans (more rows per partition key, not more keys).

Usage: python scripts/make_scaled_data.py [N_COPIES] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

# table -> columns whose id-space must shift per replica (parent and
# every foreign key referencing it shift by the same stride).
SCALED_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]

# stride per key column = max over the PARENT id space, so fk offsets
# line up with pk offsets (shared per id-family, not per table).
KEY_FAMILY = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    spark = get_spark("make_scaled_data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    strides: dict[str, int] = {}
    for fam, (tbl, col) in KEY_FAMILY.items():
        key = f"{tbl}.{col}"
        if key not in strides:
            mx = (
                spark.read.parquet(f"{SRC}/{tbl}.parquet")
                .agg(F.max(col))
                .first()[0]
            )
            strides[key] = int(mx) + 1
        strides[fam] = strides[key]

    for tbl in FIXED:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )
        print(f"{tbl}: copied (fixed dim)")

    for tbl, keys in SCALED_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        # cross join with a replica index, offset every scaling key.
        reps = spark.range(n_copies).withColumnRenamed("id", "_rep")
        wide = df.crossJoin(F.broadcast(reps))
        for col in keys:
            dt = dict(df.dtypes)[col]
            wide = wide.withColumn(
                col, (F.col(col) + F.col("_rep") * F.lit(strides[col])).cast(dt)
            )
        if tbl == "documents":
            # vary replicated text slightly so dedup families see a
            # realistic mix of exact dups (rep 0 keeps originals) and
            # near-identical variants, not a degenerate 10x dup wall.
            wide = wide.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("_rep"))
                ),
            ).withColumn("n_chars", F.length("text"))
        out = wide.drop("_rep")
        # Write a core-wide file layout: the sf0.1 source is a single
        # row group, and crossJoin preserves its partitioning, so
        # without this the replica lands as ONE file / few row groups
        # and every scan of it is 1-5 tasks — unlike any real table at
        # this volume (measured: TPC-H Q1 on the ×10 replica ran 16 s
        # on one task vs 23 s for 10× MORE data once ×100 happened to
        # split). 32 output files ≈ the layout a real pipeline's
        # parallel writer produces.
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )
        n = spark.read.parquet(f"{out_dir}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows ({n_copies}x)")

    spark.stop()


if __name__ == "__main__":
    main()
