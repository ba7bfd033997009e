"""Similarity search over embedding columns (north-star surface).

Baseline: brute-force cosine top-k — exact, O(Q·N·D), expressed as an
explode + equi-join on the vector position so the dot products are
grouped sums (decimal-exact, engine-portable) rather than a Python
loop. Scale path: random-hyperplane LSH bucketing — hyperplane signs
derive from md5 parity (deterministic, no RNG state), vectors only
compare within their bucket, turning all-pairs into an equality join.

At cluster scale the brute-force join shuffles Q·N·D rows; the LSH
variant shuffles N·D once for bucketing and then only intra-bucket
pairs — the standard recall/throughput trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT_DEC = "decimal(38,12)"


def exploded(embeddings: DataFrame) -> DataFrame:
    """(vec_id, pos, val): one row per vector component. pos is
    1-based to match SQL generate_subscripts."""
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val").cast("double").alias("val"),
    )


def norms(embeddings: DataFrame) -> DataFrame:
    """L2 norm per vector via decimal-exact sum of squares."""
    return (
        exploded(embeddings)
        .groupBy("vec_id")
        .agg(
            F.sqrt(
                F.sum((F.col("val") * F.col("val")).cast(_DOT_DEC)).cast("double")
            ).alias("norm")
        )
    )


def cosine_pairs(
    embeddings: DataFrame, queries: DataFrame
) -> DataFrame:
    """Exact cosine similarity for every (query, candidate) pair.
    ``queries`` is any subset of ``embeddings`` (same schema)."""
    q = exploded(queries).select(
        F.col("vec_id").alias("q_id"), "pos", F.col("val").alias("q_val")
    )
    c = exploded(embeddings).select(
        F.col("vec_id").alias("c_id"), "pos", F.col("val").alias("c_val")
    )
    dots = (
        q.join(c, "pos")
        .groupBy("q_id", "c_id")
        .agg(
            F.sum((F.col("q_val") * F.col("c_val")).cast(_DOT_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    nq = norms(queries).select(F.col("vec_id").alias("q_id"), F.col("norm").alias("q_norm"))
    nc = norms(embeddings).select(
        F.col("vec_id").alias("c_id"), F.col("norm").alias("c_norm")
    )
    return (
        dots.join(F.broadcast(nq), "q_id")
        .join(nc, "c_id")
        .select(
            "q_id",
            "c_id",
            (F.col("dot") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query (self-match excluded),
    deterministic tiebreak on candidate id."""
    from pyspark.sql import Window

    pairs = cosine_pairs(embeddings, queries).filter(F.col("q_id") != F.col("c_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def _plane_sign(plane: int, pos_col: Column, table: int = 0) -> Column:
    """Deterministic ±1 from md5 parity — the hyperplane 'random'
    coefficients, reproducible on any engine with md5. ``table``
    seeds independent hash tables (table 0 keeps the original
    format for oracle stability)."""
    prefix = f"{plane}_" if table == 0 else f"t{table}:{plane}_"
    h = F.md5(F.concat(F.lit(prefix), pos_col.cast("string")).cast("binary"))
    return (F.ascii(F.substring(h, 1, 1)) % 2) * 2 - 1


def lsh_buckets(embeddings: DataFrame, planes: int = 8, table: int = 0) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern of ``planes``
    projections. One explode + one grouped aggregate: each projection
    is a decimal-exact signed sum."""
    ex = exploded(embeddings)
    proj = ex.groupBy("vec_id").agg(
        *[
            F.sum(
                (F.col("val") * _plane_sign(p, F.col("pos"), table)).cast(_DOT_DEC)
            )
            .cast("double")
            .alias(f"p{p}")
            for p in range(planes)
        ]
    )
    bucket = sum(
        [
            F.when(F.col(f"p{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(planes)
        ],
        F.lit(0),
    )
    return proj.select("vec_id", bucket.cast("long").alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    buckets, then exact cosine + rank within the candidate set.

    Recall lever: ``tables`` independent hash tables of ``planes``
    bits each — a vector is a candidate if it co-buckets with the
    query in ANY table (union of equi-joins). 4 tables × 4 planes
    gives high recall at a fraction of the all-pairs cost; tune both
    to the corpus density."""
    from functools import reduce

    from pyspark.sql import Window

    def _cands(table: int) -> DataFrame:
        b = lsh_buckets(embeddings, planes, table)
        qb = b.join(queries.select("vec_id"), "vec_id").select(
            F.col("vec_id").alias("q_id"), "bucket"
        )
        cb = b.select(F.col("vec_id").alias("c_id"), "bucket")
        return (
            F.broadcast(qb)
            .join(cb, "bucket")
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id")
        )

    # prune FIRST: only co-bucketed (q, c) pairs ever reach the dot
    # product — this is what makes LSH the scale path.
    cand = reduce(DataFrame.unionByName, [_cands(t) for t in range(tables)]).distinct()
    q = exploded(queries).select(
        F.col("vec_id").alias("q_id"), "pos", F.col("val").alias("q_val")
    )
    c = exploded(embeddings).select(
        F.col("vec_id").alias("c_id"), "pos", F.col("val").alias("c_val")
    )
    dots = (
        cand.join(q, "q_id")
        .join(c, ["c_id", "pos"])
        .groupBy("q_id", "c_id")
        .agg(
            F.sum((F.col("q_val") * F.col("c_val")).cast(_DOT_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    n = norms(embeddings)
    nq = n.select(F.col("vec_id").alias("q_id"), F.col("norm").alias("q_norm"))
    nc = n.select(F.col("vec_id").alias("c_id"), F.col("norm").alias("c_norm"))
    pairs = (
        dots.join(F.broadcast(nq), "q_id")
        .join(nc, "c_id")
        .select(
            "q_id",
            "c_id",
            (F.col("dot") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``
    (doc-level near-dup by representation rather than text)."""
    pairs = cosine_pairs(embeddings, embeddings).filter(
        F.col("q_id") < F.col("c_id")
    )
    return pairs.filter(F.col("cosine") >= threshold).select(
        F.col("q_id").alias("vec_a"), F.col("c_id").alias("vec_b"), "cosine"
    )
