"""Iterative graph analytics on DataFrames — the Pregel-style pattern
(driver-side loop, one join+aggregate per superstep, per-iteration
persist) that covers PageRank-family algorithms without a graph
library. Near-duplicate clustering already runs min-label propagation
this way (operators/dedup.py); this module adds weighted-influence
ranking over the warehouse's trade graph.

Cross-engine exactness (the same policy as functions/exact.py and
curate.dsir_importance): every per-edge contribution rank(u)/outdeg(u)
is ONE correctly-rounded IEEE division, floor-quantized onto the 2^-30
lattice (×2^30 is exact, floor is exact) and summed as BIGINT —
associative, so identical on any engine and any partitioning; the
damping step is two IEEE ops on bit-identical inputs. A plain double
sum would drift with partitioning at 100 TB; a decimal cast of the
raw double can tie-split between rounding modes.

Scale shape per superstep: edges ⋈ ranks on src (edges pre-partitioned
once on src and persisted — every iteration reuses the layout), one
dst-keyed aggregate, one left join back onto the node list (broadcast
at small N, shuffle at web scale). State is two slim frames (nodes,
ranks); lineage is cut by persisting each iteration's ranks, or the
10-deep plan recompiles the whole chain every action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import scoped_persist

_LATTICE = float(1 << 30)


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over directed ``edges(src, dst)`` (string node ids),
    fixed ``iterations`` supersteps, dangling mass dropped (the
    simplification that keeps the per-step formula a pure local
    aggregate; both engines of the gate apply the same formula, so
    results stay hash-exact).

    rank₀(v) = 1/N;
    rankₜ(v) = (1−d)/N + d · (Σ_{u→v} ⌊2³⁰·rankₜ₋₁(u)/out(u)⌋) / 2³⁰
    """
    edges = scoped_persist(
        edges.select("src", "dst").distinct().repartition("src")
    )
    nodes = scoped_persist(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = scoped_persist(edges.join(outdeg, "src"))
    n_total = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = nodes.join(F.broadcast(n_total))
    ranks = scoped_persist(
        base.select(
            "node", "__n", (F.lit(1.0) / F.col("__n")).alias("rank")
        )
    )
    for _ in range(iterations):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .select(
                "dst",
                F.floor(
                    (F.col("rank") / F.col("outdeg")) * F.lit(_LATTICE)
                ).cast("long").alias("__q"),
            )
        )
        sums = contrib.groupBy("dst").agg(F.sum("__q").alias("__s"))
        ranks = scoped_persist(
            base.join(sums, base["node"] == sums["dst"], "left")
            .select(
                "node",
                "__n",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__s"), F.lit(0)).cast("double")
                        / F.lit(_LATTICE)
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def trade_graph(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Undirected customer⟷supplier trade graph as two directed edge
    sets: an edge per distinct (customer, supplier) trading pair,
    labels prefixed so the two id spaces cannot collide. The pair
    distinct folds at key granularity before anything else — the
    edge list is relationship-sized, never lineitem-sized."""
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.union(rev)
