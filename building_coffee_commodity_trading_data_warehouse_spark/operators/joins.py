"""Join surface: star joins, role-playing dims, merge-dedup upsert.

Reference semantics (SURVEY.md §2.3):
  J1/J2  equi LEFT joins fact→dim (ODS.py:107) — dims are small, so the
         engine broadcasts them: no shuffle of the fact side at all.
  J3     role-playing dim — the same dim joined twice under two keys
         (ODS.py:103,107-108, contract vs prev_contract).
  J4     dedup-merge upsert: DELETE WHERE EXISTS on the natural key,
         then append (STG.py:102-115) — here a left_anti + unionByName,
         one shuffle on the key, no correlated subquery.

Scale: broadcast joins keep the 100 TB fact table shuffle-free for dim
lookups; the J4 merge shuffles once on the natural key (and at real
scale would target a date-partitioned table so only touched partitions
rewrite — see plans/ingest.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_join(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """J1/J2: fact → customer → nation → region, dims broadcast.
    Left joins, as in the reference (dim misses must survive)."""
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
            orders.o_custkey == customer.c_custkey,
            "left",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey, "left")
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey, "left")
    )


def roleplay_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """J3: the nation dim plays two roles — customer nation and
    supplier nation — joined twice under different keys with aliased
    column names (the Spark twin of pandas' _x/_y suffix consumption
    at ODS.py:108)."""
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left")
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey, "left")
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey, "left")
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"), "left")
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"), "left")
    )


def merge_upsert(target: DataFrame, staged: DataFrame, keys: list[str]) -> DataFrame:
    """J4 (STG.py:102-115): idempotent merge — staged rows replace
    target rows sharing the natural key, everything else is kept.
    left_anti removes matched target rows (the DELETE WHERE EXISTS),
    unionByName appends the staged snapshot (the INSERT SELECT).
    Applying the same snapshot twice is a no-op: the property the
    reference's loader relies on for reruns."""
    return target.join(staged.select(*keys), keys, "left_anti").unionByName(staged)


def semi_anti(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """EXISTS / NOT EXISTS as left_semi / left_anti (the decorrelated
    form of STG.py:102-110's subquery)."""
    with_cust = orders.join(customer, orders.o_custkey == customer.c_custkey, "left_semi")
    return with_cust


def union_all_by_name(dfs: list[DataFrame]) -> DataFrame:
    """A5 (STG.py:304 pd.concat): column-name-aware union of N frames."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-buster equi-join: the HOT side gets a deterministic salt
    (hash of ``salt_cols`` — default all its other columns — mod N),
    the small side is replicated N× with every salt value, and the
    join key becomes (key, salt) — one hot key now spreads over N
    reducers instead of melting one.

    Result is row-identical to ``left.join(right, key, how)``. AQE's
    skew-join split handles moderate skew automatically ONLY when the
    join's children are bare shuffle stages; it does NOT match a join
    fed by an aggregate (measured r11, dedup.keeper_election), so for
    those shapes this salt is the load-bearing spread, not insurance.
    Explicit salting is likewise for the pathological keys a 100 TB
    fact table meets (null-heavy FKs, default values). Pass a short
    ``salt_cols`` (a row-identity column) when the left side is wide —
    the hash is evaluated per probe row in both the join filter and
    the projection. Deterministic: no rand(), so the plan replays
    identically (speculative retries, AQE re-optimization).
    """
    other = salt_cols or [c for c in left.columns if c != key]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in other]), F.lit(salt_buckets))
    salted_left = left.withColumn("_salt", salt.cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    salted_right = right.withColumn("_salt", salts)
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


def reconcile_snapshots(
    old: DataFrame, new: DataFrame, key: str, value_col: str
) -> DataFrame:
    """Snapshot reconciliation: full-outer join two table versions on
    the natural key and classify every key as added / removed /
    changed / unchanged — the audit diff behind every warehouse reload
    (the relational form of the reference's before/after row-count
    checks, STG.py:97-100, upgraded to row-level evidence).

    One co-partitioned shuffle on the key for both sides (sort-merge at
    scale); the classification is a projection."""
    o = old.select(F.col(key), F.col(value_col).alias("old_val"))
    n = new.select(F.col(key), F.col(value_col).alias("new_val"))
    change = (
        F.when(F.col("old_val").isNull(), "added")
        .when(F.col("new_val").isNull(), "removed")
        .when(F.col("old_val") != F.col("new_val"), "changed")
        .otherwise("unchanged")
    )
    return o.join(n, key, "full_outer").select(
        key, "old_val", "new_val", change.alias("change")
    )


def hinted_join(
    left: DataFrame,
    right: DataFrame,
    on,
    strategy: str = "shuffle_hash",
    how: str = "inner",
) -> DataFrame:
    """Join with an explicit physical-strategy hint — the operator's
    escape hatch when the optimizer's choice is wrong for a known
    workload: ``shuffle_hash`` skips both sort passes of a sort-merge
    join (right side builds an in-memory hash map per partition — the
    win when one side is much smaller but too big to broadcast),
    ``merge`` forces sort-merge (spill-safe for giant×giant),
    ``broadcast`` forces replication, ``shuffle_replicate_nl`` the
    cartesian fallback. The hint changes ONLY the physical strategy;
    results are identical, which is exactly what the gate's plain-join
    oracle checks."""
    valid = {"broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"}
    if strategy not in valid:
        raise ValueError(f"strategy must be one of {sorted(valid)}")
    return left.join(right.hint(strategy), on, how)
