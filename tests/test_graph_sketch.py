"""Planted-value tests for the iterative-graph and heavy-hitter
operators (the cross-engine gate proves portability; these prove the
MATH against independent Python references)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators.aggregates import (
    heavy_hitters,
)
from building_coffee_commodity_trading_data_warehouse_spark.operators.graph import (
    pagerank,
    trade_graph,
)


def _py_pagerank(edges, iterations=10, d=0.85):
    """Reference implementation with the same 2^-30 lattice folds."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += math.floor((rank[u] / out[u]) * (1 << 30))
        rank = {
            v: (1.0 - d) / n + d * (float(s[v]) / (1 << 30)) for v in nodes
        }
    return rank


def test_pagerank_star_graph_matches_reference(spark):
    """Undirected star: the hub must outrank every leaf, and every
    value must equal the quantized Python reference bit for bit."""
    edges = []
    for leaf in "abcde":
        edges.append(("hub", leaf))
        edges.append((leaf, "hub"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    ref = _py_pagerank(edges)
    assert got.keys() == ref.keys()
    for v in ref:
        assert got[v] == ref[v], (v, got[v], ref[v])
    assert all(got["hub"] > got[leaf] for leaf in "abcde")


def test_trade_graph_is_undirected_distinct(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 11)], "l_orderkey long, l_suppkey long"
    )
    od = spark.createDataFrame(
        [(1, 100), (2, 100)], "o_orderkey long, o_custkey long"
    )
    got = {(r["src"], r["dst"]) for r in trade_graph(li, od).collect()}
    assert got == {
        ("c:100", "s:10"), ("s:10", "c:100"),
        ("c:100", "s:11"), ("s:11", "c:100"),
    }


def test_heavy_hitters_exact_and_partition_invariant(spark):
    """Planted skew: output equals the brute-force groupBy filter
    exactly, for every repartitioning (the MG sieve must never drop a
    true heavy hitter)."""
    rows = (
        [("whale",)] * 300
        + [("shark",)] * 120
        + [(f"fish{i}",) for i in range(580)]
    )
    df = spark.createDataFrame(rows, "k string")
    n, k = len(rows), 10
    brute = {
        (r["k"], r["c"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > n / k)
        .collect()
    }
    assert brute == {("whale", 300), ("shark", 120)}
    for parts in (1, 7, 32):
        got = {
            (r["item"], r["freq"])
            for r in heavy_hitters(df.repartition(parts), "k", k=k).collect()
        }
        assert got == brute, parts


def test_count_min_certificates_and_exactness(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.operators.aggregates import (
        count_min_estimates,
    )

    # skewed stream: "hot" 500x, 50 distinct cold items 1x each
    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(50)]
    items = spark.createDataFrame(rows, "item string")
    out = {
        r["item"]: r
        for r in count_min_estimates(items, topn=10).collect()
    }
    assert len(out) == 10 and "hot" in out
    for r in out.values():
        assert r["no_underestimate"] == 1
        assert r["within_bound"] == 1
        assert r["cms_estimate"] >= r["true_count"]
    assert out["hot"]["true_count"] == 500


def test_count_min_partition_invariant(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.operators.aggregates import (
        count_min_estimates,
    )

    rows = [(f"w{i % 37}",) for i in range(1000)]
    one = spark.createDataFrame(rows, "item string").coalesce(1)
    many = spark.createDataFrame(rows, "item string").repartition(16)
    a = sorted(map(tuple, count_min_estimates(one, topn=15).collect()))
    b = sorted(map(tuple, count_min_estimates(many, topn=15).collect()))
    assert a == b


def test_triangle_counts_known_graphs(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.operators.graph import (
        triangle_counts,
    )

    # K4: every node sits in C(3,2)=3 triangles
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    # star graph: hub with many leaves has no triangle at all
    star = [(0, i) for i in range(1, 20)]
    assert (
        triangle_counts(
            spark.createDataFrame(star, "src long, dst long")
        ).count()
        == 0
    )

    # triangle + pendant edge, duplicate/reversed edges collapse
    g = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4)]
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(g, "src long, dst long")
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}
